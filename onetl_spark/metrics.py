"""Spark command metrics.

The reference attaches a Py4J ``SparkListener`` and aggregates
execution/job/stage/task I/O metrics (onetl/_metrics/recorder.py:15,
listener/listener.py:19-133, command.py:22). A Python-side listener needs
the Py4J callback server; instead we read the same numbers from Spark's
SQL status store (``sharedState().statusStore().executionsList()``) after
the fact — no callback channel, works on any PySpark 3.4+/4.x session.

``SparkMetricsRecorder`` snapshots the store on enter and aggregates the
metrics of executions that completed during the block.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class SparkCommandMetrics:
    input_rows: int = 0
    input_bytes: int = 0
    output_rows: int = 0
    output_bytes: int = 0
    executions: int = 0
    raw: dict[str, int] = field(default_factory=dict)

    @property
    def is_empty(self) -> bool:
        return self.executions == 0

    def details(self) -> str:
        return (
            f"executions={self.executions} input_rows={self.input_rows} "
            f"input_bytes={self.input_bytes} output_rows={self.output_rows} "
            f"output_bytes={self.output_bytes}"
        )


_INPUT_ROWS = ("number of output rows",)  # on scan nodes
_SIZE_RE = re.compile(r"^([\d.]+)\s*(B|KiB|MiB|GiB|TiB)?", re.I)
_UNIT = {"B": 1, "KIB": 1024, "MIB": 1024**2, "GIB": 1024**3, "TIB": 1024**4}


def _parse_size(text: str) -> int:
    text = text.strip().split("(")[0].strip()
    total = text.replace("total", "").strip()
    m = _SIZE_RE.match(total)
    if not m:
        return 0
    value = float(m.group(1))
    unit = (m.group(2) or "B").upper()
    return int(value * _UNIT.get(unit, 1))


def _parse_count(text: str) -> int:
    # metric strings look like "1,234" or "total (min, med, max)\n1234 ..."
    digits = re.sub(r"[^\d]", "", text.split("(")[0])
    return int(digits) if digits else 0


class SparkMetricsRecorder:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._start_id = -1
        self._metrics = SparkCommandMetrics()

    def _status_store(self):
        return self.spark._jsparkSession.sharedState().statusStore()

    def _latest_execution_id(self) -> int:
        try:
            executions = self._status_store().executionsList()
            n = executions.size()
            if n == 0:
                return -1
            return executions.apply(n - 1).executionId()
        except Exception:
            return -1

    def __enter__(self) -> "SparkMetricsRecorder":
        self._start_id = self._latest_execution_id()
        return self

    def __exit__(self, *exc) -> bool:
        self._collect()
        return False

    def metrics(self) -> SparkCommandMetrics:
        return self._metrics

    def _collect(self) -> None:
        out = SparkCommandMetrics()
        try:
            store = self._status_store()
            executions = store.executionsList()
            for i in range(executions.size()):
                execution = executions.apply(i)
                if execution.executionId() <= self._start_id:
                    continue
                out.executions += 1
                metric_values = store.executionMetrics(execution.executionId())
                id_to_name = {}
                metrics_iter = execution.metrics().iterator()
                while metrics_iter.hasNext():
                    m = metrics_iter.next()
                    id_to_name[m.accumulatorId()] = m.name()
                values_iter = metric_values.iterator()
                while values_iter.hasNext():
                    entry = values_iter.next()
                    name = id_to_name.get(entry._1())
                    if name is None:
                        continue
                    text = str(entry._2())
                    lowered = name.lower()
                    if lowered == "number of output rows":
                        out.output_rows += _parse_count(text)
                    elif "bytes read" in lowered or lowered == "size of files read":
                        out.input_bytes += _parse_size(text)
                    elif "records read" in lowered:
                        out.input_rows += _parse_count(text)
                    elif "bytes written" in lowered or "written output" in lowered:
                        out.output_bytes += _parse_size(text)
                    elif "records written" in lowered or "number of written rows" in lowered:
                        out.output_rows += _parse_count(text)
        except Exception:  # metrics are best-effort (db_writer.py:208-211)
            pass
        self._metrics = out


@contextmanager
def override_job_description(spark: SparkSession, description: str):
    """Set the Spark job description for the duration of a block
    (onetl/_util/spark.py:204-221)."""
    sc = spark.sparkContext
    original = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(description)
    try:
        yield
    finally:
        sc.setJobDescription(original)


def observe_dataframe(df, name: str, **metric_exprs):
    """Attach free in-flight metrics to a DataFrame via ``Observation``:
    the expressions (counts, null tallies, sums) are computed DURING the
    next action's existing pass over the data — zero extra jobs, zero
    extra scans, works identically on a 100 TB input.

    Returns ``(observed_df, observation)``; read ``observation.get``
    after an action runs. The data-quality counterpart of
    ``SparkMetricsRecorder`` (which captures I/O volume from the SQL
    status store).

    >>> df2, obs = observe_dataframe(df, "load", rows=F.count(F.lit(1)),
    ...                              null_keys=F.count_if(F.col("k").isNull()))
    >>> df2.write.parquet(...); obs.get["null_keys"]
    """
    from pyspark.sql import Observation

    if not metric_exprs:
        raise ValueError("observe_dataframe requires at least one metric expression")
    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in metric_exprs.items()]
    return df.observe(obs, *exprs), obs
