from onetl_spark.file.format.base import FileFormat
from onetl_spark.file.format.csv import CSV
from onetl_spark.file.format.json import JSON
from onetl_spark.file.format.jsonline import JSONLine
from onetl_spark.file.format.parquet import Parquet
from onetl_spark.file.format.orc import ORC
from onetl_spark.file.format.avro import Avro
from onetl_spark.file.format.xml import XML
from onetl_spark.file.format.excel import Excel

__all__ = ["FileFormat", "CSV", "JSON", "JSONLine", "Parquet", "ORC", "Avro", "XML", "Excel"]
