from .rl import ValueGuidedRLPipeline
