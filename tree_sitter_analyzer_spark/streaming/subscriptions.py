"""Per-subscriber standing-query registry: (session, selector) → delta push.

Re-expresses the reference's subscription surface — a registry of
(session_id, selector) pairs re-evaluated on every sync event, pushing
ONLY the pairs whose result actually changed, with burst coalescing
(min_interval) and dead-session cleanup (``hyphae_subscribe_tool.py:
81-114``, ``watch_push_bridge.py:30-99``) — on top of the engine's
selector-string surface and Structured Streaming.

Spark shape: subscriptions are driver-side metadata (tiny); evaluation is
one lazy Chain plan per selector against the CURRENT table snapshot —
``drive()`` plugs directly into a ``foreachBatch`` standing query (the
I2 pattern in tests/test_streaming.py), so each micro-batch re-evaluates
every active selector and ships per-subscriber deltas. Snapshots keep
only result KEYS (image_id set, capped by the Chain's default cap), so
registry memory is bounded per subscriber.

Delta contract: ``{added: [...], removed: [...], total_matches: N}`` —
pushed only when non-empty (the "notify only when the selector result
actually moves" rule). A push callback raising ``DeadSession`` removes
every subscription of that session (the dead-loop cleanup analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..plans.chain import Chain
from ..plans.selector import apply_selector


class DeadSession(Exception):
    """Raised by a push callback when its subscriber is gone."""


@dataclass
class Subscription:
    session_id: str
    selector: str
    push: Callable[[dict[str, Any]], None]
    min_interval: float = 0.0
    last_keys: frozenset[str] | None = None  # None = never evaluated
    last_eval_at: float | None = None
    pushes: int = 0
    last_error: str | None = None


@dataclass
class SubscriptionRegistry:
    _subs: dict[tuple[str, str], Subscription] = field(default_factory=dict)

    # -- management (subscribe/unsubscribe/cleanup) -----------------------

    def subscribe(
        self,
        session_id: str,
        selector: str,
        push: Callable[[dict[str, Any]], None],
        min_interval: float = 0.0,
    ) -> tuple[str, str]:
        """Register; the (session, selector) pair is the sub id (resubscribe
        replaces the callback and resets the snapshot). Selector SYNTAX is
        validated here so a malformed string fails at subscribe time, not
        inside every later drive(); semantic errors (e.g. an unknown sort
        column) surface on the first drive as ``last_error``."""
        from ..plans.selector import _tokens

        _tokens(selector)  # raises SelectorError on malformed syntax
        sub = Subscription(session_id, selector, push, min_interval)
        self._subs[(session_id, selector)] = sub
        return (session_id, selector)

    def unsubscribe(self, session_id: str, selector: str | None = None) -> int:
        """Cancel one subscription, or every one of a session."""
        keys = [
            k
            for k in self._subs
            if k[0] == session_id and (selector is None or k[1] == selector)
        ]
        for k in keys:
            del self._subs[k]
        return len(keys)

    def active(self) -> list[tuple[str, str]]:
        return sorted(self._subs)

    # -- evaluation -------------------------------------------------------

    def drive(self, table: DataFrame, now: float = 0.0) -> list[tuple[str, str]]:
        """Re-evaluate every subscription against the current snapshot and
        push non-empty deltas. Returns the (session, selector) pairs
        pushed. ``now`` is injected (no wall-clock reads) so the
        min_interval throttle is deterministic in tests and callable from
        a foreachBatch with the batch timestamp."""
        pushed: list[tuple[str, str]] = []
        dead: set[str] = set()
        for key, sub in list(self._subs.items()):
            if sub.session_id in dead:
                continue
            if (
                sub.last_eval_at is not None
                and now - sub.last_eval_at < sub.min_interval
            ):
                continue  # burst coalescing: throttled, snapshot untouched
            # Evaluation errors are isolated PER SUBSCRIPTION: one bad
            # selector must not kill every later subscriber's batch.
            try:
                chain = apply_selector(
                    Chain(table.sparkSession, table), sub.selector
                )
                total = chain._df.count()
                # Chain.df() caps deterministically (unsorted chains order
                # by the unique KEY first), so snapshots never shift
                # between batches for an unchanged result.
                capped = (
                    chain
                    if chain._limit is not None
                    else chain.take(Chain.DEFAULT_MAX_RESULTS)
                )
                keys_now = frozenset(
                    r[chain.KEY]
                    for r in capped.df().select(chain.KEY).collect()
                )
            except Exception as exc:
                sub.last_eval_at = now
                sub.last_error = str(exc)
                continue
            sub.last_eval_at = now
            sub.last_error = None
            if sub.last_keys is not None:
                added = sorted(keys_now - sub.last_keys)
                removed = sorted(sub.last_keys - keys_now)
            else:
                added, removed = sorted(keys_now), []
            if not added and not removed:
                # result didn't move (or first evaluation found nothing) —
                # no notification, but the snapshot is now established
                sub.last_keys = keys_now
                continue
            delta = {
                "session_id": sub.session_id,
                "selector": sub.selector,
                "added": added,
                "removed": removed,
                "total_matches": total,
            }
            try:
                sub.push(delta)
            except DeadSession:
                dead.add(sub.session_id)
                continue
            except Exception as exc:
                # Transient push failure: snapshot NOT committed, so the
                # delta is recomputed and redelivered on the next drive.
                sub.last_error = f"push failed: {exc}"
                continue
            # Commit the snapshot only after a successful push — a failed
            # push must not silently swallow the delta.
            sub.last_keys = keys_now
            sub.pushes += 1
            pushed.append(key)
        for session_id in dead:
            self.unsubscribe(session_id)
        return pushed
