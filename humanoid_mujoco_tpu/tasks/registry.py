"""Task registry — the tasks/tasks.cc:48-75 analog.

The reference registers 24 tasks behind `GetTasks()`; agents select by
name or id (grpc Init task_id). Here factories register lazily so
importing the registry stays cheap; `get_task("Humanoid Cap Stand")`
returns a fresh Task pytree.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from .base import Task

_REGISTRY: Dict[str, Callable[..., Task]] = {}


def register(name: str, factory: Callable[..., Task]):
    _REGISTRY[name] = factory


def list_tasks() -> List[str]:
    return sorted(_REGISTRY)


def get_task(name: str, **kwargs) -> Task:
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; available: {list_tasks()}")
    return _REGISTRY[name](**kwargs)


def _register_builtin():
    from .particle import particle_fixed_task, particle_task
    from .stand import stand_task
    from .walk import walk_task
    register("Humanoid Cap Stand", stand_task)
    register("Humanoid Cap Walk", walk_task)
    register("Particle", particle_task)
    register("ParticleFixed", particle_fixed_task)


_register_builtin()
