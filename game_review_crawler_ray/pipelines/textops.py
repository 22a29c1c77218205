"""Training-data text operators (dedup, langid, quality, ANN) — filled in
milestone 4. QUERIES/ORACLE_SQL feed __ray_entry__."""
QUERIES: dict = {}
ORACLE_SQL: dict = {}
