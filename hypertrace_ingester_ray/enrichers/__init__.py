from .base import ConversationContext, Enricher, EnrichmentRegistry
from .core import DEFAULT_ENRICHERS, build_default_registry

__all__ = [
    "ConversationContext",
    "Enricher",
    "EnrichmentRegistry",
    "DEFAULT_ENRICHERS",
    "build_default_registry",
]
