"""Name -> constructor registries driving the YAML config system.

Mirrors the reference's string-dispatch config shape (reference:
moduleregister.py:1-22 and the `name:` convention used throughout
train.py:37-42, flows.py:51-55) so that reference configs port mechanically,
but with namespaced registries instead of one shared class-level dict.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    """A namespaced string -> callable registry."""

    def __init__(self, namespace: str):
        self.namespace = namespace
        self._record: Dict[str, Callable] = {}

    def register(self, obj: Callable = None, *, name: str = None):
        def _do(o):
            key = name or o.__name__
            if key in self._record and self._record[key] is not o:
                raise KeyError(f"{self.namespace}: duplicate registration {key!r}")
            self._record[key] = o
            return o

        if obj is None:
            return _do
        return _do(obj)

    def get(self, name: str) -> Callable:
        try:
            return self._record[name]
        except KeyError:
            raise KeyError(
                f"{self.namespace}: unknown name {name!r}; "
                f"known: {sorted(self._record)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._record

    def names(self):
        return sorted(self._record)


# Domain registries (reference declares one subclass registry per domain:
# flows.py:19, couplelib.py:18, priorlib.py:12, distlib.py:11, roundlib.py:13,
# extenddim.py:12, nnlayer.py:17, nnblock.py:19, vqvae.py:17, activate.py:15).
FLOWS = Registry("flows")
COUPLINGS = Registry("couplings")
PRIORS = Registry("priors")
DISTRIBUTIONS = Registry("distributions")
ROUNDS = Registry("rounds")
EXTENDDIMS = Registry("extenddims")
LAYERS = Registry("layers")
BLOCKS = Registry("blocks")
ENDECODERS = Registry("endecoders")
ACTIVATIONS = Registry("activations")
DATASETS = Registry("datasets")
DATALOADERS = Registry("dataloaders")
OPTIMIZERS = Registry("optimizers")
SCHEDULERS = Registry("schedulers")
TRAINERS = Registry("trainers")


def build(registry: Registry, config: dict, **extra) -> Any:
    """Instantiate from a config dict with a `name` key (reference pattern:
    `Register.get(cfg.pop('name'))(**cfg)`, e.g. train.py:38-41). The input
    dict is not mutated."""
    cfg = dict(config)
    name = cfg.pop("name")
    cls = registry.get(name)
    return cls(**cfg, **extra)
