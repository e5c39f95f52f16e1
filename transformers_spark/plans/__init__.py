from .dependencies import (
    DependencyResolver,
    destination_urn,
    resolve_with_catalyst,
    resolve_with_regex,
)

__all__ = [
    "DependencyResolver",
    "destination_urn",
    "resolve_with_catalyst",
    "resolve_with_regex",
]
