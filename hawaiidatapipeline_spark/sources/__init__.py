"""Source/sink layer: ingestion (the reference's SODA fetch loop reborn),
multimodal binary columns, and landing-zone conventions."""
