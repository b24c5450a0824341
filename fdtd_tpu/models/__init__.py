from .example import example_scene

__all__ = ["example_scene"]
