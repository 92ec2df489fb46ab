"""Stage registry: the user-extension surface.

Replaces the reference's profile/schema/tool registries
(``/root/reference/src/profiles/registry.py:87-145``, ``SchemaRegistry``,
``TOOL_DISPATCH`` ``src/client/backends/gemma_tools.py:394-427``) with one
mechanism: named batch-fns / actor classes registered at import time and
composed into a ``Dataset`` plan from a declarative config list
(SURVEY.md §2.11 "a Stage registry of named batch-fns/actor classes
composed into the pipeline by config").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(frozen=True)
class StageSpec:
    name: str
    fn: Callable | type
    is_actor: bool = False
    defaults: dict[str, Any] = field(default_factory=dict)


_REGISTRY: dict[str, StageSpec] = {}


def register_stage(name: str, fn: Callable | type, is_actor: bool = False,
                   **defaults: Any) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = StageSpec(name, fn, is_actor, defaults)


def get_stage(name: str) -> StageSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def compose(ds: ray.data.Dataset,
            stages: list[str | dict[str, Any]]) -> ray.data.Dataset:
    """Apply a config list of stages: ["clean", {"stage": "score",
    "batch_size": 1024}] → chained ``map_batches`` calls."""
    for item in stages:
        cfg = {"stage": item} if isinstance(item, str) else dict(item)
        spec = get_stage(cfg.pop("stage"))
        kwargs = {"batch_format": "pyarrow", **spec.defaults, **cfg}
        if spec.is_actor and "concurrency" not in kwargs:
            kwargs["concurrency"] = 2
        ds = ds.map_batches(spec.fn, **kwargs)
    return ds


def _register_builtins() -> None:
    from ..sources.edi import edi_parse_batch
    from ..stages.extract import extract_turn_batch
    from ..stages.model import LayoutScorer
    from ..stages.phi import redact_batch
    from ..stages.reconcile import run_dual_pass_batch
    register_stage("extract_turns", extract_turn_batch)
    register_stage("layout_score", LayoutScorer, is_actor=True, batch_size=2048)
    register_stage("phi_redact", redact_batch)
    register_stage("dual_pass", run_dual_pass_batch)
    register_stage("edi_parse", edi_parse_batch)


_register_builtins()


class CorrectionTracker:
    """Actor-held KV of human corrections → prompt/tiebreak hints.

    Minimal analogue of the reference's correction memory
    (``/root/reference/src/memory/correction_tracker.py``,
    ``src/memory/dynamic_prompt.py`` — past human corrections feed future
    extraction hints). Keyed by field family; ``hints`` returns the most
    frequent corrected value per wrong value, most-corrected first.
    Deploy as a named Ray actor when corrections must be shared across
    pipeline runs; plain instance for driver-side use.
    """

    def __init__(self) -> None:
        self._corrections: dict[str, dict[str, dict[str, int]]] = {}

    def record(self, field: str, wrong: str, right: str) -> None:
        by_wrong = self._corrections.setdefault(field, {})
        counts = by_wrong.setdefault(wrong, {})
        counts[right] = counts.get(right, 0) + 1

    def hints(self, field: str, limit: int = 5) -> list[tuple[str, str, int]]:
        """[(wrong, best_correction, count)] sorted by count desc, wrong asc."""
        out = []
        for wrong, counts in self._corrections.get(field, {}).items():
            best = max(sorted(counts), key=lambda r: counts[r])
            out.append((wrong, best, counts[best]))
        out.sort(key=lambda t: (-t[2], t[0]))
        return out[:limit]

    def correct(self, field: str, value: str) -> str:
        """Apply the dominant correction for a known-wrong value, else echo."""
        counts = self._corrections.get(field, {}).get(value)
        if not counts:
            return value
        return max(sorted(counts), key=lambda r: counts[r])
