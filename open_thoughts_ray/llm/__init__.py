"""LLM annotation surface (SURVEY.md §2.1#17-18 / §2.5): CompletionsMap
plugin registry, deterministic mock backend, shared rate limiter, and
the actor-pool completions operator."""

from .backend import (  # noqa: F401
    BACKENDS,
    MockLLMBackend,
    build_backend,
    canonical_prompt,
    register_backend,
    shared_rate_limiter,
)
from .completions import CompletionsActor, completions  # noqa: F401
from .maps import (  # noqa: F401
    MAP_REGISTRY,
    BinaryClassifierMap,
    ChatMap,
    CompletionsMap,
    JudgeMap,
    ListMap,
    ScorerMap,
    build_map,
    fill_template,
    register_map,
)
from . import maps_ext  # noqa: F401  (registers the domain map families)
