from onetl_spark.file.file_df_reader import FileDFReader
from onetl_spark.file.file_df_writer import FileDFWriter, FileDFWriterOptions

__all__ = ["FileDFReader", "FileDFWriter", "FileDFWriterOptions"]
