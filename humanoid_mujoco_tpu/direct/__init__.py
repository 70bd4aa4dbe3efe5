from .optimizer import DirectConfig, DirectResult, direct_optimize

__all__ = ["DirectConfig", "DirectResult", "direct_optimize"]
