"""Hook/slot event system.

Re-implements the reference's semantics (onetl/hooks/support_hooks.py:178,
slot.py:625, hook.py:22,42,374) with a compact design:

- ``@support_hooks`` marks a class whose ``@slot`` methods accept bound
  callbacks;
- ``@SomeClass.method.bind`` registers a hook;
- hooks may run ``before`` the slot (positional args available), ``after``
  (result available), or as context managers (generator hooks: code before
  ``yield`` runs before, code after runs after, and the yielded value may
  replace the result via ``process_result`` semantics);
- hooks have integer priority (lower runs first) and can be
  enabled/disabled individually or globally via ``stop``/``resume``.
"""

from __future__ import annotations

import functools
import inspect
import logging
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

log = logging.getLogger(__name__)

_GLOBAL = threading.local()


def _hooks_enabled() -> bool:
    return getattr(_GLOBAL, "enabled", True)


def stop_all_hooks() -> None:
    _GLOBAL.enabled = False


def resume_all_hooks() -> None:
    _GLOBAL.enabled = True


@dataclass
class Hook:
    callback: Callable
    priority: int = 0
    enabled: bool = True

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False


class Slot:
    """A hookable method. Callbacks can be plain functions (run before) or
    generators (wrap the call; may replace the result by yielding once and
    receiving the result at the second ``send``)."""

    def __init__(self, func: Callable):
        self.func = func
        self.hooks: list[Hook] = []
        functools.update_wrapper(self, func)

    def bind(self, callback: Callable | Hook = None, *, priority: int = 0):
        if callback is None:
            return lambda cb: self.bind(cb, priority=priority)
        hook = callback if isinstance(callback, Hook) else Hook(callback, priority=priority)
        self.hooks.append(hook)
        self.hooks.sort(key=lambda h: h.priority)
        return hook

    def unbind(self, hook: Hook) -> None:
        """Remove a previously bound hook (test/teardown helper)."""
        self.hooks = [h for h in self.hooks if h is not hook]

    def skip_hooks(self):
        """Context manager disabling this slot's hooks."""
        slot = self

        class _Skip:
            def __enter__(self):
                slot._skipped = True
                return slot

            def __exit__(self, *exc):
                slot._skipped = False
                return False

        return _Skip()

    def _active_hooks(self) -> list[Hook]:
        if not _hooks_enabled() or getattr(self, "_skipped", False):
            return []
        return [h for h in self.hooks if h.enabled]

    def __set_name__(self, owner, name):
        self._name = name

    def __get__(self, instance, owner=None):
        if instance is None:
            return self
        return _BoundSlot(self, instance)

    def __call__(self, instance, *args, **kwargs):
        return _BoundSlot(self, instance)(*args, **kwargs)


class _BoundSlot:
    def __init__(self, slot: Slot, instance):
        self.slot = slot
        self.instance = instance
        functools.update_wrapper(self, slot.func)

    @property
    def bind(self):
        return self.slot.bind

    @property
    def skip_hooks(self):
        return self.slot.skip_hooks

    def __call__(self, *args, **kwargs):
        generators = []
        for hook in self.slot._active_hooks():
            if inspect.isgeneratorfunction(hook.callback):
                gen = hook.callback(self.instance, *args, **kwargs)
                next(gen)  # run the "before" part
                generators.append(gen)
            else:
                hook.callback(self.instance, *args, **kwargs)
        result = self.slot.func(self.instance, *args, **kwargs)
        for gen in reversed(generators):
            try:
                replacement = gen.send(result)
                if replacement is not None:
                    result = replacement
                gen.close()
            except StopIteration as stop:
                if stop.value is not None:
                    result = stop.value
        return result


def slot(func: Callable) -> Slot:
    return Slot(func)


def support_hooks(cls):
    """Class decorator; purely declarative in this implementation (slots
    are self-contained), kept for API parity with the reference."""
    cls.__onetl_spark_hooks__ = True
    return cls
