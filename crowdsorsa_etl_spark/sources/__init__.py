from crowdsorsa_etl_spark.sources.parquet import load_table, load_tables, register_views  # noqa: F401
