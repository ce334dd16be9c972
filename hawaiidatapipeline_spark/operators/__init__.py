"""Reusable operator implementations (the engine's library layer).

``queries/`` exposes thin checked entry points; the algorithms that carry
real design weight (similarity search, minhash dedup, as-of join) live here
so library users can call them directly on arbitrary DataFrames.
"""
