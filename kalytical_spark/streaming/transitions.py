"""Pure state-transition logic for the dependency-trigger state machine —
the semantics of the reference dispatcher/incubation path
(dispatcher.py:31-46, data_provider.py:204-230), written once and executed
two ways:

* batch replay: operators/replay.py folds a whole sorted delivery history
  per pipeline through `apply_delivery` inside applyInPandas;
* streaming: streaming/incubation.py applies the same function per
  micro-batch inside applyInPandasWithState, with the accumulated trigger
  map as the keyed state.

Semantics reproduced (and their reference citations):
* operator 'any': fires on EVERY satisfied trigger event (the reference
  fires each time a trigger arrives, dispatcher.py:41-42 — deliberate,
  documented duplicate-fire behavior).
* operator 'all' with exactly one dependency: fires immediately
  (dispatcher.py:41).
* operator 'all' with N deps: deliveries accumulate in a trigger map
  (upstream uuid -> satisfying exec uuid); when all N are satisfied the
  pipeline fires with that map as source_uuids and the map resets
  (job_culler.py:28-33 re-queue path).

CAVEAT (checkpointed state vs DAG redefinition): TriggerState counts seen
upstreams without knowing the CURRENT dependency set, so state restored
from a checkpoint after a topology change (deps swapped while n_deps
stayed equal) can fire with stale sources the batch replay would not
produce. Redefining a pipeline's dependencies requires resetting its keyed
state (fresh checkpoint dir or a keyed state purge) — the standard
structured-streaming contract for stateful logic changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TriggerState:
    """Keyed state for one downstream pipeline."""

    operator: str  # 'any' | 'all'
    n_deps: int
    seen: dict[str, str] = field(default_factory=dict)  # upstream -> exec_uuid


@dataclass(frozen=True)
class Fire:
    """A dispatch decision: the pipeline fires with these upstream sources."""

    sources: tuple[tuple[str, str], ...]  # sorted (upstream, exec_uuid)
    event_time: object  # timestamp of the delivery that completed the set


def apply_delivery(
    state: TriggerState, upstream: str, exec_uuid: str, event_time
) -> Fire | None:
    """Apply one trigger delivery; return a Fire decision or None."""
    if state.operator == "any" or state.n_deps == 1:
        return Fire(sources=((upstream, exec_uuid),), event_time=event_time)
    # 'all' with N>1: latest delivery per upstream wins the slot
    state.seen[upstream] = exec_uuid
    if len(state.seen) >= state.n_deps:
        fire = Fire(
            sources=tuple(sorted(state.seen.items())), event_time=event_time
        )
        state.seen.clear()
        return fire
    return None


def sources_repr(sources: tuple[tuple[str, str], ...]) -> str:
    """Canonical string form of a source map (stable for comparisons)."""
    return ",".join(f"{u}={e}" for u, e in sources)
