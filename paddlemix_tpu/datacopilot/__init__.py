from .dataset import MMDataset, ParallelMode
