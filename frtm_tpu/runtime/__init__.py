from .tracker import Tracker
from .trainer import Trainer, TrainerModel, TModelCache

__all__ = ["Tracker", "Trainer", "TrainerModel", "TModelCache"]
