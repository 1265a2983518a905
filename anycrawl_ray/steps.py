"""PipelineStep extension registry (SURVEY.md §2.10) — the user-extension
surface of the engine.

Mirrors the reference's two extension mechanisms, re-expressed Ray-Data-first:

- named factory registry with defaults registered at import and user
  ``register()`` overrides (reference
  packages/scrape/src/engines/EngineFactory.ts:196-225
  ``EngineFactoryRegistry.register/createEngine/getRegisteredEngineTypes``)
- pre/post hooks PREPENDED around the core transform (reference
  packages/scrape/src/core/EngineConfigurator.ts:142-147 merges
  ``[limitFilterHook, ...existingHooks]`` into preNavigationHooks)

A step is either a plain function ``fn(batch: pa.Table) -> pa.Table`` (runs
as Ray tasks) or a callable CLASS (runs as a ``map_batches`` actor pool —
state built once per actor in ``__init__``). ``apply_steps`` composes
registered steps onto any ``ray.data.Dataset``; the crawl pipeline applies
registered span-steps to every span batch before the parquet sink, so a
user can inject e.g. PII scrubbing or extra scoring without touching engine
code (conformance-tested: a no-op step preserves byte parity).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa


@dataclass(frozen=True)
class PipelineStep:
    """One registered batch transform: ``fn_or_cls`` maps an Arrow batch to
    an Arrow batch; classes are instantiated once per actor (stateful setup
    in __init__), functions run as stateless Ray tasks."""

    name: str
    fn_or_cls: Callable
    # actor-pool sizing when fn_or_cls is a class (ignored for functions)
    concurrency: int = 2
    batch_size: int | None = None
    kwargs: dict = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn_or_cls)

    def make_callable(self) -> Callable:
        """A plain callable for inline application (the crawl pipeline calls
        steps inside its own fetch workers rather than adding a Dataset
        stage per step)."""
        if self.is_actor:
            return self.fn_or_cls(**self.kwargs)
        if self.kwargs:
            import functools

            return functools.partial(self.fn_or_cls, **self.kwargs)
        return self.fn_or_cls


class StepRegistry:
    """Named step registry + hook lists (EngineFactoryRegistry analog)."""

    def __init__(self):
        self._steps: dict[str, PipelineStep] = {}
        self._pre_hooks: list[str] = []
        self._post_hooks: list[str] = []

    def register(self, name: str, fn_or_cls: Callable, **opts) -> PipelineStep:
        """Register (or override — last registration wins, like Map.set in
        EngineFactoryRegistry.register) a named step."""
        step = PipelineStep(name, fn_or_cls, **opts)
        self._steps[name] = step
        return step

    def get(self, name: str) -> PipelineStep:
        if name not in self._steps:
            raise KeyError(f"no step registered under {name!r}")  # :216-218
        return self._steps[name]

    def registered_names(self) -> list[str]:
        return list(self._steps)  # getRegisteredEngineTypes analog

    # -- hooks (EngineConfigurator.ts:142-147 prepend semantics) ----------
    def add_pre_hook(self, name: str) -> None:
        """PREPEND a pre-hook (the reference merges its own hook first:
        ``[limitFilterHook, ...existingHooks]``)."""
        self._pre_hooks.insert(0, name)

    def add_post_hook(self, name: str) -> None:
        self._post_hooks.append(name)

    def pipeline(self, names: list[str]) -> list[PipelineStep]:
        """Steps in execution order: pre-hooks, named core steps, post-hooks."""
        order = self._pre_hooks + list(names) + self._post_hooks
        return [self.get(n) for n in order]

    def apply_steps(self, ds, names: list[str]):
        """Compose the named steps (plus hooks) onto a ray.data.Dataset —
        functions as task stages, classes as actor pools."""
        for step in self.pipeline(names):
            if step.is_actor:
                ds = ds.map_batches(
                    step.fn_or_cls,
                    fn_constructor_kwargs=step.kwargs,
                    concurrency=step.concurrency,
                    batch_size=step.batch_size,
                    batch_format="pyarrow",
                )
            else:
                ds = ds.map_batches(
                    step.make_callable(),
                    batch_size=step.batch_size,
                    batch_format="pyarrow",
                )
        return ds

    def apply_inline(self, batch: pa.Table, callables: list[Callable]) -> pa.Table:
        for fn in callables:
            batch = fn(batch)
        return batch


# module-level default registry (EngineFactoryRegistry static map analog)
default_registry = StepRegistry()


def register(name: str, fn_or_cls: Callable, **opts) -> PipelineStep:
    return default_registry.register(name, fn_or_cls, **opts)
