from .server import StudioServer, TrainingJobManager

__all__ = ["StudioServer", "TrainingJobManager"]
