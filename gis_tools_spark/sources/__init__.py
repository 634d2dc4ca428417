"""Sources: readers/derivations for the driver's parquet tables and the
engine's fixture tables."""
