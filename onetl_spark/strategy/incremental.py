"""Incremental strategies.

- ``IncrementalStrategy``: reads ``WHERE hwm_expr > saved_hwm`` (exclusive
  start); the window's stop value is pinned pre-read and persisted to the
  HWM store on clean context exit (incremental_strategy.py:13,
  hwm_strategy.py:115-138). Optional ``offset`` re-reads a tail by
  shifting the fetched HWM back (incremental_strategy.py:405-411).
- ``IncrementalBatchStrategy``: the same semantics chunked into
  ``(current, next]`` windows of ``step`` (incremental_strategy.py:414+,
  batch_hwm_strategy.py:20-155).
"""

from __future__ import annotations

from typing import Any

from onetl_spark.strategy.base import HWMStrategy
from onetl_spark.strategy.batch import BatchHWMStrategy


class IncrementalStrategy(HWMStrategy):
    def __init__(self, offset: Any = None) -> None:
        super().__init__()
        self.offset = offset

    def fetch_hwm(self) -> None:
        super().fetch_hwm()
        if self.offset is not None and self.hwm is not None and self.hwm.value is not None:
            # re-read a tail: hwm -= offset (incremental_strategy.py:405-411)
            self.hwm.set_value(self.hwm.value - self.offset)


class IncrementalBatchStrategy(BatchHWMStrategy):
    def __init__(self, step: Any, start: Any = None, stop: Any = None, offset: Any = None) -> None:
        super().__init__(step=step, start=start, stop=stop)
        self.offset = offset

    def fetch_hwm(self) -> None:
        super().fetch_hwm()
        if self.offset is not None and self.hwm is not None and self.hwm.value is not None:
            self.hwm.set_value(self.hwm.value - self.offset)
