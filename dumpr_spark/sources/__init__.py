from dumpr_spark.sources.files import read_parquet, read_csv, read_json, read_table_dir, load_table

__all__ = ["read_parquet", "read_csv", "read_json", "read_table_dir", "load_table"]
