from .model import Model, TrainingCallback
