from .state_estimation import find_ideal_root_height, set_robot_state
from .server import MPCServer, serve

__all__ = ["find_ideal_root_height", "set_robot_state", "MPCServer",
           "serve"]
