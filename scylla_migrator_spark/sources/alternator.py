"""Alternator load-balancing client — fixture analog (Z10).

The reference wraps the AWS SDK in an Alternator-aware client that
discovers cluster nodes (the `/localnodes` endpoint), scopes them by
rack/datacenter, spreads requests across the surviving nodes, and
RE-POLLS discovery on an interval so topology changes (node added,
node decommissioned) rebalance the rotation without a restart
(DynamoUtils.buildDynamoClient + applyAlternatorSettings,
DynamoUtils.scala:104-155; settings model config/AlternatorSettings.scala
with activeRefreshIntervalMs / idleRefreshIntervalMs).

Without a live cluster, this fixture keeps the decision logic real —
scope filtering, empty-scope failure, deterministic round-robin, and the
periodic-refresh state machine — over a discovery callable standing in for
the `/localnodes` HTTP endpoint. Time is injected (epoch millis argument),
so the refresh cadence is unit-testable without wall-clock sleeps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from scylla_migrator_spark.config import AlternatorSettings, ConfigError

DEFAULT_ACTIVE_REFRESH_MS = 10_000
DEFAULT_IDLE_REFRESH_MS = 60_000


@dataclass(frozen=True)
class AlternatorNode:
    """One row of the /localnodes discovery response."""

    host: str
    datacenter: str
    rack: str


class AlternatorFixtureClient:
    """Scope-filters discovered nodes per the settings' routing scope and
    round-robins requests across them.

    * rack scope: only nodes matching (datacenter, rack)
    * datacenter scope: only nodes in the datacenter
    * cluster scope: every node
    An empty INITIAL post-filter node set is a configuration error — the
    reference client would have no endpoint to route to.

    Discovery refresh (DynamoUtils.scala:104-155 / the Alternator LB
    client's localnodes re-poll): pass ``discover`` (the /localnodes stand-
    in) and call :meth:`maybe_refresh` with the current epoch-millis (real
    callers tick it before each request). The re-poll interval is
    ``active_refresh_interval_ms`` when requests were routed since the last
    refresh, ``idle_refresh_interval_ms`` otherwise. On refresh:

    * newly discovered in-scope nodes ENTER the rotation,
    * disappeared nodes DRAIN (leave the rotation; recorded in
      ``drained``),
    * round-robin order stays deterministic (discovery order, stable
      across refreshes for surviving nodes),
    * a failed or empty-scoped discovery keeps the last-known-good node
      set (counted in ``failed_refreshes``) — a transient discovery blip
      must not empty the rotation.
    """

    def __init__(
        self,
        nodes: list[AlternatorNode] | None,
        settings: AlternatorSettings,
        discover: Callable[[], list[AlternatorNode]] | None = None,
        now_ms: int = 0,
    ):
        if nodes is None:
            if discover is None:
                raise ConfigError("either a static node list or discover is required")
            nodes = discover()
        self.settings = settings
        self._discover = discover
        scoped = self._scope(nodes)
        if not scoped:
            kind, dc, rack = settings.routing_scope()
            raise ConfigError(
                f"no alternator nodes match routing scope {kind!r} "
                f"(datacenter={dc!r}, rack={rack!r})"
            )
        self.nodes = scoped
        self._idx = 0
        self._last_refresh_ms = now_ms
        self._routed_since_refresh = 0
        self.drained: list[AlternatorNode] = []
        self.failed_refreshes = 0

    # -- scope filter --------------------------------------------------------
    def _scope(self, nodes: list[AlternatorNode]) -> list[AlternatorNode]:
        kind, dc, rack = self.settings.routing_scope()
        if kind == "rack":
            return [n for n in nodes if n.datacenter == dc and n.rack == rack]
        if kind == "datacenter":
            return [n for n in nodes if n.datacenter == dc]
        return list(nodes)

    # -- refresh state machine ----------------------------------------------
    def _interval_ms(self) -> int:
        if self._routed_since_refresh:
            return (
                self.settings.active_refresh_interval_ms
                or DEFAULT_ACTIVE_REFRESH_MS
            )
        return self.settings.idle_refresh_interval_ms or DEFAULT_IDLE_REFRESH_MS

    def maybe_refresh(self, now_ms: int) -> bool:
        """Re-poll discovery if the active/idle interval elapsed; returns
        whether a refresh ran. Safe to call before every request."""
        if self._discover is None or now_ms - self._last_refresh_ms < self._interval_ms():
            return False
        self._last_refresh_ms = now_ms
        self._routed_since_refresh = 0
        try:
            scoped = self._scope(self._discover())
        except Exception:
            self.failed_refreshes += 1
            return True
        if not scoped:
            # keep last-known-good: an empty response must not stop routing
            self.failed_refreshes += 1
            return True
        current = self.nodes[self._idx % len(self.nodes)]
        removed = [n for n in self.nodes if n not in scoped]
        self.drained.extend(removed)
        self.nodes = scoped
        # resume the rotation at the node that was due next, so a refresh
        # neither restarts the cycle nor skips survivors; if that node was
        # itself removed, restart at the head of the new rotation
        self._idx = scoped.index(current) if current in scoped else 0
        return True

    def next_node(self, now_ms: int | None = None) -> AlternatorNode:
        """The node the next request routes to (deterministic round-robin);
        pass ``now_ms`` to give the refresh state machine a chance to
        re-poll first."""
        if now_ms is not None:
            self.maybe_refresh(now_ms)
        node = self.nodes[self._idx % len(self.nodes)]
        self._idx = (self._idx + 1) % len(self.nodes)
        self._routed_since_refresh += 1
        return node
