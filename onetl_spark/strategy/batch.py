"""Chunked (batch) HWM strategy iteration.

Semantics from the reference ``onetl/strategy/batch_hwm_strategy.py:20-155``:

- the strategy is an iterator of ``(current, next]`` windows of width
  ``step`` from a lower bound to an upper bound;
- the FIRST window has an inclusive start, subsequent ones exclusive
  (hwm_strategy.py:24-32, batch_hwm_strategy.py:98-108);
- at most ``MAX_ITERATIONS = 100`` chunks (guard at :28,125-131);
- the step must move toward the stop value (monotonicity check :110-131).

Bounds are supplied by the reader on the first iteration (source min/max
probe), unless given explicitly via ``start``/``stop``.
"""

from __future__ import annotations

from typing import Any

from onetl_spark.exceptions import IllegalWindowError, StrategyError
from onetl_spark.strategy.base import HWMStrategy


class BatchHWMStrategy(HWMStrategy):
    MAX_ITERATIONS = 100

    def __init__(self, step: Any, start: Any = None, stop: Any = None) -> None:
        super().__init__()
        if not step:
            raise StrategyError("step must be a non-zero increment")
        self.step = step
        self.start = start
        self.stop = stop
        self.current: Any = None
        self.current_including = True  # first window includes its start
        self._iteration = -1
        self._bounds_ready = start is not None and stop is not None

    # --- iterator protocol --------------------------------------------------

    def __iter__(self) -> "BatchHWMStrategy":
        return self

    def __next__(self) -> "BatchHWMStrategy":
        self._iteration += 1
        if self._iteration == 0:
            # first window is read with whatever bounds the reader computes
            return self
        if not self._bounds_ready:
            # reader never ran inside the loop — nothing to iterate
            raise StopIteration
        if self.is_finished:
            raise StopIteration
        self.current = self.next_value(self.current)
        self.current_including = False
        if self.is_finished:
            raise StopIteration
        if self._iteration >= self.MAX_ITERATIONS:
            # guard AFTER the natural termination checks so a range that
            # needs exactly MAX_ITERATIONS chunks still completes
            raise StrategyError(
                f"Batch strategy exceeded MAX_ITERATIONS={self.MAX_ITERATIONS}",
            )
        return self

    # --- window planning (called by the reader) -------------------------------

    def set_bounds(self, start: Any, stop: Any, start_including: bool = True) -> None:
        """First-run bound initialization from HWM value / source min-max.

        ``start_including=False`` when the lower bound is a previously-saved
        HWM value (already read in an earlier run) — matches the reference's
        edge semantics (hwm_strategy.py:24-32, batch_hwm_strategy.py:98-108).
        """
        if self.start is None:
            self.start = start
            self.current_including = start_including
        if self.stop is None:
            self.stop = stop
        if self.current is None:
            self.current = self.start
        self._check_monotonic()
        self._bounds_ready = self.start is not None and self.stop is not None

    def _check_monotonic(self) -> None:
        if self.start is None or self.stop is None:
            return
        try:
            # windows are ascending-only, like the reference: a descending
            # range would invert the (current, next] edges silently
            if self.stop < self.start:
                raise IllegalWindowError(
                    f"stop={self.stop!r} must be >= start={self.start!r}; "
                    "descending batch ranges are not supported",
                )
            moved = self.start + self.step > self.start
        except TypeError:
            return
        if not moved:
            raise IllegalWindowError(
                f"step={self.step!r} does not move start={self.start!r} toward stop={self.stop!r}",
            )

    def next_value(self, value: Any) -> Any:
        nxt = value + self.step
        if self.stop is not None and nxt > self.stop:
            return self.stop
        return nxt

    @property
    def window_right(self) -> Any:
        if self.current is None:
            return self.stop
        return self.next_value(self.current)

    @property
    def is_first_batch(self) -> bool:
        return self._iteration <= 0

    @property
    def is_finished(self) -> bool:
        return (
            self._bounds_ready
            and self.current is not None
            and self.stop is not None
            and self.current >= self.stop
        )
