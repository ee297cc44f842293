"""Feature node / template declarations.

Reimplements the declaration layer of ianlini/feagen (reconstructed from
public knowledge — reference mount is empty, see SURVEY.md §0):

- ``FeatureNode``     ≈ a method decorated with ``@will_generate(handler,
  keys)`` + ``@require(deps)`` (feagen/decorators.py::will_generate,
  ~L10-45, unverified): one callable producing one or more named output
  columns from named dependencies.
- ``FeatureTemplate`` ≈ feagen's regex data keys (feagen/dag.py::
  DataDAG.get_node_keys_dict, ~L40-80, unverified): a pattern that is
  expanded into a concrete node per requested name.
- ``will_generate`` / ``require`` decorators + ``FeatureGenerator`` base
  class mirror feagen's user-facing authoring API on top of these.

Spark-first: a node's ``fn`` is a ``DataFrame -> DataFrame`` transform that
appends the node's output columns. Catalyst fuses the per-node transforms;
nodes marked ``checkpoint=True`` become materialization barriers handled by
the engine + checkpoint store.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class FeatureNode:
    """One generator step: deps in, named output columns appended.

    name:       node name (unique in a registry).
    outputs:    column names this node appends to the frame.
    deps:       column names required (input columns or other nodes' outputs).
    fn:         DataFrame -> DataFrame transform appending exactly `outputs`.
    version:    bumped when the node's logic changes; part of the
                checkpoint fingerprint (SURVEY.md §7 hard part (c)).
    checkpoint: materialize this node's outputs to the checkpoint store
                (feagen analogue: non-memory data handler).
    """

    name: str
    outputs: tuple[str, ...]
    deps: tuple[str, ...]
    fn: Callable[[DataFrame], DataFrame]
    version: str = "1"
    checkpoint: bool = False

    def __post_init__(self) -> None:
        if not self.outputs:
            raise ValueError(f"node {self.name!r} declares no outputs")
        object.__setattr__(self, "outputs", tuple(self.outputs))
        object.__setattr__(self, "deps", tuple(self.deps))


@dataclass(frozen=True)
class FeatureTemplate:
    """Parameterized node family, feagen's regex data keys.

    ``pattern`` is matched with ``re.fullmatch`` against requested names
    that no concrete node produces; ``make(match)`` returns the concrete
    node (driver-side expansion, before planning).
    """

    pattern: str
    make: Callable[[re.Match], FeatureNode]
    name: str = ""

    def expand(self, requested: str) -> FeatureNode | None:
        m = re.fullmatch(self.pattern, requested)
        if m is None:
            return None
        node = self.make(m)
        if requested not in node.outputs:
            raise ValueError(
                f"template {self.pattern!r} expanded for {requested!r} but the "
                f"node outputs {node.outputs}"
            )
        return node


# ---------------------------------------------------------------------------
# feagen-style authoring decorators (SURVEY.md §2.A A1)
# ---------------------------------------------------------------------------


def will_generate(
    outputs: str | Sequence[str],
    *,
    version: str = "1",
    checkpoint: bool = False,
):
    """Mark a function/method as a feature node producing ``outputs``.

    feagen analogue: ``@will_generate(handler, keys)``; the handler choice
    maps to ``checkpoint`` (memory handler → False, h5py/pickle → True).
    """

    outs = (outputs,) if isinstance(outputs, str) else tuple(outputs)

    def deco(fn):
        fn.__feagen_outputs__ = outs
        fn.__feagen_version__ = version
        fn.__feagen_checkpoint__ = checkpoint
        if not hasattr(fn, "__feagen_deps__"):
            fn.__feagen_deps__ = ()
        return fn

    return deco


def require(deps: str | Sequence[str]):
    """Declare dependency columns for a ``@will_generate`` function."""

    ds = (deps,) if isinstance(deps, str) else tuple(deps)

    def deco(fn):
        fn.__feagen_deps__ = tuple(getattr(fn, "__feagen_deps__", ())) + ds
        return fn

    return deco


class FeatureGeneratorMeta(type):
    """Collect decorated methods into ``__feature_nodes__``.

    feagen analogue: data_generators.py::DataGeneratorType.__new__
    (~L20-60, unverified) assembling the networkx DiGraph; here we only
    collect specs — the DAG itself is built by core.dag.FeatureDAG.
    """

    def __new__(mcs, name, bases, attrs):
        cls = super().__new__(mcs, name, bases, attrs)
        # keyed by attribute name so a subclass OVERRIDE replaces the
        # base entry instead of duplicating it (code-review r6: the
        # list form produced two nodes named 'f' → AmbiguousFeatureError
        # on a decorated override, and silently kept the BASE impl on
        # an undecorated override). MRO is walked base→derived, later
        # wins; an undecorated override deletes the base registration —
        # overriding a feature method without re-decorating is a
        # contract error better surfaced as 'unknown feature' than as
        # silently running the base body.
        by_name: dict[str, FeatureNode] = {}
        for base in reversed(cls.__mro__):
            for attr_name, attr in vars(base).items():
                if hasattr(attr, "__feagen_outputs__"):
                    by_name[attr_name] = FeatureNode(
                        name=attr_name,
                        outputs=attr.__feagen_outputs__,
                        deps=tuple(attr.__feagen_deps__),
                        fn=attr,
                        version=attr.__feagen_version__,
                        checkpoint=attr.__feagen_checkpoint__,
                    )
                elif attr_name in by_name and callable(attr):
                    del by_name[attr_name]
        cls.__feature_nodes__ = list(by_name.values())
        return cls


class FeatureGenerator(metaclass=FeatureGeneratorMeta):
    """Subclass + decorate methods with @will_generate/@require, then pass
    ``cls.__feature_nodes__`` (bound via :meth:`nodes`) to the engine."""

    @classmethod
    def nodes(cls) -> list[FeatureNode]:
        out = []
        for n in cls.__feature_nodes__:
            fn = n.fn

            def bound(df, _fn=fn, _cls=cls):
                return _fn(_cls, df)

            out.append(
                FeatureNode(
                    name=n.name,
                    outputs=n.outputs,
                    deps=n.deps,
                    fn=bound,
                    version=n.version,
                    checkpoint=n.checkpoint,
                )
            )
        return out
