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
      the last failure, then the breaker moves to ``half_open`` and
      probing resumes.
    - ``half_open``: calls flow until a result is recorded (like the
      reference, concurrent callers may all probe — there is no
      single-probe latch); a success closes the breaker and resets the
      count; a failure re-opens it (count keeps growing, timestamp
      refreshes).

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


# ---------------------------------------------------------------------------
# module registry (orchestrator/module_registry.py)
# ---------------------------------------------------------------------------

MODULE_STATUSES = ["registered", "initializing", "active", "degraded",
                   "stopped", "error"]


@dataclass(frozen=True)
class Version:
    """Semantic version triple (module_registry.py:68-115)."""

    major: int
    minor: int
    patch: int = 0

    @classmethod
    def parse(cls, s: str) -> "Version":
        parts = (s.split("-")[0].split("+")[0].split("."))
        nums = [int(p) for p in parts[:3]] + [0] * (3 - len(parts[:3]))
        return cls(*nums)

    def __str__(self) -> str:
        return f"{self.major}.{self.minor}.{self.patch}"

    def as_tuple(self) -> tuple[int, int, int]:
        return (self.major, self.minor, self.patch)

    def is_compatible(self, other: "Version") -> bool:
        """Same-major, at-least-as-new compatibility
        (module_registry.py:93-97)."""
        return (self.major == other.major
                and self.as_tuple() >= other.as_tuple())


@dataclass
class ModuleMetadata:
    """module_registry.py:144-175 — name, version, provided capabilities,
    and required capability → minimum version."""

    name: str
    version: str
    capabilities: list[str] = field(default_factory=list)
    requires: dict[str, str] = field(default_factory=dict)
    status: str = "registered"


class ModuleRegistry:
    """Module lifecycle + capability-based dependency resolution
    (module_registry.py): register modules declaring capabilities and
    version-gated requirements; resolve a dependency-ordered start
    sequence (topological); drive status transitions."""

    def __init__(self):
        self._modules: dict[str, ModuleMetadata] = {}

    def register(self, meta: ModuleMetadata) -> None:
        Version.parse(meta.version)  # validate eagerly
        if meta.name in self._modules:
            raise ValueError(f"module {meta.name!r} already registered")
        self._modules[meta.name] = meta

    def get(self, name: str) -> ModuleMetadata:
        return self._modules[name]

    def modules(self) -> list[str]:
        return sorted(self._modules)

    def find_providers(self, capability: str, min_version: str | None = None
                       ) -> list[str]:
        """Modules providing a capability, compatible with min_version
        when given; deterministic name order."""
        need = Version.parse(min_version) if min_version else None
        out = []
        for name in sorted(self._modules):
            m = self._modules[name]
            if capability not in m.capabilities:
                continue
            if need is not None and not Version.parse(m.version).is_compatible(need):
                continue
            out.append(name)
        return out

    def resolve_order(self) -> list[str]:
        """Dependency-ordered start list: every module after some
        provider of each capability it requires. Raises on a missing
        provider or a dependency cycle."""
        providers: dict[str, str] = {}
        for name, m in sorted(self._modules.items()):
            for need, minv in m.requires.items():
                found = self.find_providers(need, minv)
                if not found:
                    raise ValueError(
                        f"module {name!r} requires {need!r}>={minv}: no "
                        f"compatible provider")
                providers[(name, need)] = found[0]
        order, seen, visiting = [], set(), set()

        def visit(name: str):
            if name in seen:
                return
            if name in visiting:
                raise ValueError(f"dependency cycle through {name!r}")
            visiting.add(name)
            for need in self._modules[name].requires:
                visit(providers[(name, need)])
            visiting.discard(name)
            seen.add(name)
            order.append(name)

        for name in sorted(self._modules):
            visit(name)
        return order

    def set_status(self, name: str, status: str) -> None:
        if status not in MODULE_STATUSES:
            raise ValueError(f"unknown status {status!r}")
        self._modules[name].status = status

    def start_all(self, initializers: dict[str, Callable[[], Any]] | None = None
                  ) -> dict[str, str]:
        """Initialize modules in dependency order; a failing initializer
        marks the module 'error' and downstream dependents stay
        'registered'. Returns name → status."""
        initializers = initializers or {}
        active: set[str] = set()
        for name in self.resolve_order():
            m = self._modules[name]
            # a requirement is satisfied only by a provider that has
            # ALREADY initialized successfully — "some other provider
            # exists but hasn't started" is not satisfied
            dep_ok = all(
                any(p in active for p in self.find_providers(need, minv))
                for need, minv in m.requires.items())
            if not dep_ok:
                continue  # stays 'registered'
            self.set_status(name, "initializing")
            try:
                fn = initializers.get(name)
                if fn is not None:
                    fn()
                self.set_status(name, "active")
                active.add(name)
            except Exception:  # noqa: BLE001 — lifecycle must continue
                self.set_status(name, "error")
        return {n: m.status for n, m in sorted(self._modules.items())}
