"""Query catalog: every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable with a DuckDB oracle SQL twin."""
