from onetl_spark.db.reader import DBReader
from onetl_spark.db.writer import DBWriter

__all__ = ["DBReader", "DBWriter"]
