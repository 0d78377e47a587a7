"""Remote / object-store sources.

The reference carries a dormant Azure Blob path: download a blob to memory,
parse CSV, plus a container listing that extracts Y/M/D date prefixes and
yields them chronologically (reference: src/blob_storage.py:9-44; SURVEY
§2.1 S5/S6). In Spark neither needs custom code — any Hadoop-compatible
URI (wasbs://, abfss://, s3a://, gs://, hdfs://, file://) plugs into the
same schema'd readers, and date-prefix discovery is a FileSystem glob.

These helpers make that explicit and add the reference's chronological
ordering semantics (SURVEY §2.6 O5).
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_DATE_PREFIX = re.compile(r"(\d{4})/(\d{2})/(\d{2})$")


def read_remote_csv(spark: SparkSession, uri: str, schema: StructType) -> DataFrame:
    """CSV scan over any Hadoop-compatible URI. The cluster needs the
    matching connector jar (hadoop-azure for wasbs/abfss, hadoop-aws for
    s3a) — a deploy-time concern, not a code one."""
    return spark.read.schema(schema).option("header", True).csv(uri)


def list_date_prefixes(spark: SparkSession, root_uri: str) -> list[dt.date]:
    """Discover ``YYYY/MM/DD`` day-partition prefixes under a root URI and
    return them chronologically — the reference's blob-prefix scan, done
    with the Hadoop FileSystem API instead of a client-side page loop."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(root_uri + "/*/*/*")
    fs = path.getFileSystem(conf)
    dates = set()
    for status in fs.globStatus(path) or []:
        m = _DATE_PREFIX.search(status.getPath().toString())
        if m and status.isDirectory():
            y, mo, d = map(int, m.groups())
            try:
                dates.add(dt.date(y, mo, d))
            except ValueError:
                continue
    return sorted(dates)
