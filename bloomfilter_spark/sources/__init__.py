from .tables import TABLES, load_tables, read_table, register_views
from .transcripts import generate_pandas, load_transcripts, transcripts_path

__all__ = ["TABLES", "load_tables", "register_views", "read_table",
           "generate_pandas", "load_transcripts", "transcripts_path"]
