"""Column-expression function library (SURVEY.md §2.H/§2.J helpers).

Reusable builders returning Column expressions — everything stays in
whole-stage codegen; no Python in any of these paths.
"""
