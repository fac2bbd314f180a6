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


class CircuitBreaker:
    """Per-provider circuit breaker, the reference's state machine
    (llm/manager.py:113-224, defaults config :59-60):

    - ``closed``: calls flow; each failure increments failure_count;
      count ≥ failure_threshold → ``open``.
    - ``open``: calls are rejected until ``timeout_s`` has elapsed since
      the last failure, then the breaker moves to ``half_open`` and ONE
      probe call is allowed.
    - ``half_open``: a success closes the breaker and resets the count;
      a failure re-opens it (count keeps growing, timestamp refreshes).

    ``clock`` is injectable for deterministic tests.
    """

    def __init__(self, failure_threshold: int = 5, timeout_s: float = 60.0,
                 clock: Callable[[], float] = time.time):
        self.failure_threshold = failure_threshold
        self.timeout_s = timeout_s
        self.clock = clock
        self._state: dict[str, dict[str, Any]] = {}

    def _breaker(self, name: str) -> dict[str, Any]:
        return self._state.setdefault(name, {
            "state": "closed", "failure_count": 0,
            "last_failure_time": None, "last_success_time": None,
        })

    def state(self, name: str) -> str:
        return self._breaker(name)["state"]

    def allow(self, name: str) -> bool:
        """manager.py:_is_circuit_breaker_open inverted — open breakers
        reject until the timeout elapses, then transition to half_open
        and admit the probe."""
        b = self._breaker(name)
        if b["state"] == "open":
            if (self.clock() - b["last_failure_time"]) > self.timeout_s:
                b["state"] = "half_open"
                return True
            return False
        return True

    def record(self, name: str, success: bool) -> None:
        """manager.py:_update_circuit_breaker."""
        b = self._breaker(name)
        if success:
            b["failure_count"] = 0
            b["last_success_time"] = self.clock()
            if b["state"] in ("open", "half_open"):
                b["state"] = "closed"
        else:
            b["failure_count"] += 1
            b["last_failure_time"] = self.clock()
            if b["failure_count"] >= self.failure_threshold:
                b["state"] = "open"


@dataclass
class FallbackChain:
    """Multi-provider failover guarded by the reference circuit breaker
    (llm/manager.py): providers are tried in order; a provider whose
    breaker is open is skipped; successes/failures feed the breaker so a
    repeatedly-failing provider stops being called until its timeout
    admits a half-open probe."""

    providers: list[tuple[str, Callable[..., Any]]]
    failure_threshold: int = 5
    cooldown_s: float = 60.0
    clock: Callable[[], float] = time.time
    breaker: CircuitBreaker = field(init=False)

    def __post_init__(self):
        self.breaker = CircuitBreaker(self.failure_threshold,
                                      self.cooldown_s, self.clock)

    def call(self, *args, **kw):
        errors = []
        for name, fn in self.providers:
            if not self.breaker.allow(name):
                errors.append(f"{name}: circuit breaker open")
                continue
            try:
                out = fn(*args, **kw)
            except Exception as exc:  # noqa: BLE001 — chain semantics
                self.breaker.record(name, False)
                errors.append(f"{name}: {exc}")
                continue
            self.breaker.record(name, True)
            return out
        raise RuntimeError("all providers failed: " + "; ".join(errors))


register_defaults()
