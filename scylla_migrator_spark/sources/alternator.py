"""Alternator load-balancing client — fixture analog (Z10).

The reference wraps the AWS SDK in an Alternator-aware client that
discovers cluster nodes (the `/localnodes` endpoint), scopes them by
rack/datacenter, and spreads requests across the surviving nodes
(DynamoUtils.buildDynamoClient + applyAlternatorSettings,
DynamoUtils.scala:104-155; settings model config/AlternatorSettings.scala).

Without a live cluster, this fixture keeps the decision logic real —
scope filtering, empty-scope failure, deterministic round-robin — over a
statically-supplied node list standing in for the discovery response.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from scylla_migrator_spark.config import AlternatorSettings, ConfigError


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
    An empty post-filter node set is a configuration error — the reference
    client would have no endpoint to route to.
    """

    def __init__(self, nodes: list[AlternatorNode], settings: AlternatorSettings):
        kind, dc, rack = settings.routing_scope()
        if kind == "rack":
            scoped = [n for n in nodes if n.datacenter == dc and n.rack == rack]
        elif kind == "datacenter":
            scoped = [n for n in nodes if n.datacenter == dc]
        else:
            scoped = list(nodes)
        if not scoped:
            raise ConfigError(
                f"no alternator nodes match routing scope {kind!r} "
                f"(datacenter={dc!r}, rack={rack!r})"
            )
        self.settings = settings
        self.nodes = scoped
        self._rr = itertools.cycle(scoped)

    def next_node(self) -> AlternatorNode:
        """The node the next request routes to (deterministic round-robin)."""
        return next(self._rr)
