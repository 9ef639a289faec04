"""Model registry keyed by the reference's model names.

The reference dispatches on lowercase names scattered across
utils/helpers.py:148-213 and utils/pipeline.py:67-158; here a single
registry maps the canonical names ("ResNet18", ..., "CLIPSeg") to factories.
Lookup is case-insensitive, matching the reference's `.lower()` dispatch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Dict[str, Any]] = {}


def register_model(name: str, task: str, **meta):
    """Class decorator registering a model factory under `name`.

    task: "classification" or "segmentation".
    """

    def wrap(factory: Callable):
        _REGISTRY[name.lower()] = {
            "name": name,
            "task": task,
            "factory": factory,
            **meta,
        }
        return factory

    return wrap


def _ensure_zoo_loaded():
    """Importing the models package populates the registry."""
    if not _REGISTRY:
        import medseg_tpu.models  # noqa: F401


def get_model(name: str) -> Dict[str, Any]:
    _ensure_zoo_loaded()
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"Unknown model: {name}. Registered: {sorted(e['name'] for e in _REGISTRY.values())}"
        )
    return _REGISTRY[key]


def list_models(task: str | None = None):
    _ensure_zoo_loaded()
    entries = sorted(_REGISTRY.values(), key=lambda e: e["name"])
    if task is not None:
        entries = [e for e in entries if e["task"] == task]
    return [e["name"] for e in entries]
