from .io import open_files, write_dataset
from .ingest import ingest_snapshot, ingest_lightcone

__all__ = ["open_files", "write_dataset", "ingest_snapshot", "ingest_lightcone"]
