"""Provider/plugin registry: pluggable embedding, LLM, storage reader
implementations.

Reference: /root/reference/memory_core/plugins/plugin_manager.py:1-439 +
plugin_registry.py + {storage,llm,embedding}_plugin.py — config-driven
registration/selection of backends; and the LLM fallback chain with
circuit breaker (/root/reference/memory_core/llm/manager.py).

Spark stance: providers are plain Python callables used at the two
Python seams (embedding UDF, unit-extraction UDF) and reader factories
for sources. The fallback chain tries providers in order, remembering
failures (simple circuit breaker)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


class Registry:
    """Name → factory registry per capability kind."""

    def __init__(self):
        self._providers: dict[str, dict[str, Callable]] = {}

    def register(self, kind: str, name: str, factory: Callable) -> None:
        self._providers.setdefault(kind, {})[name] = factory

    def get(self, kind: str, name: str) -> Callable:
        try:
            return self._providers[kind][name]
        except KeyError:
            raise KeyError(f"no {kind!r} provider named {name!r}; "
                           f"have {sorted(self._providers.get(kind, {}))}") from None

    def names(self, kind: str) -> list[str]:
        return sorted(self._providers.get(kind, {}))


REGISTRY = Registry()


def register_defaults() -> None:
    from memory_engine_spark.operators.ingestion import embed_text

    REGISTRY.register("embedding", "hashed_projection",
                      lambda dim=768: (lambda texts: [embed_text(t, dim).tolist()
                                                      for t in texts]))


@dataclass
class FallbackChain:
    """Multi-provider failover with a cooldown circuit breaker
    (llm/manager.py): a provider that throws is skipped for
    ``cooldown_s`` before being retried."""

    providers: list[tuple[str, Callable[..., Any]]]
    cooldown_s: float = 60.0
    _broken: dict[str, float] = field(default_factory=dict)

    def call(self, *args, **kw):
        errors = []
        now = time.time()
        for name, fn in self.providers:
            if self._broken.get(name, 0) > now:
                continue
            try:
                return fn(*args, **kw)
            except Exception as exc:  # noqa: BLE001 — chain semantics
                self._broken[name] = now + self.cooldown_s
                errors.append(f"{name}: {exc}")
        raise RuntimeError("all providers failed: " + "; ".join(errors))


register_defaults()
