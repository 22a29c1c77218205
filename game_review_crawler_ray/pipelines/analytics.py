"""Analytics pipelines (sentiment, keywords, trends, issues) — filled in
milestone 3. QUERIES/ORACLE_SQL feed __ray_entry__."""
QUERIES: dict = {}
ORACLE_SQL: dict = {}
