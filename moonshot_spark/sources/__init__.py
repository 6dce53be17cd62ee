from moonshot_spark.sources.parquet import load_table, load_tables, events_to_panel

__all__ = ["load_table", "load_tables", "events_to_panel"]
