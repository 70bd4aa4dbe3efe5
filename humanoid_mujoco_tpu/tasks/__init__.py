from .base import Task, TermSpec, cost_terms, cost_value, trajectory_cost
from .particle import (particle_fixed_task, particle_model, particle_task)
from .registry import get_task, list_tasks, register, task_model
from .stand import stand_task, stand_residual
from .walk import walk_task, walk_residual

__all__ = ["Task", "TermSpec", "cost_terms", "cost_value",
           "trajectory_cost", "stand_task", "stand_residual",
           "walk_task", "walk_residual", "particle_task",
           "particle_fixed_task", "particle_model",
           "get_task", "list_tasks", "register", "task_model"]
