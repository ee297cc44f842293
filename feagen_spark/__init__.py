"""feagen_spark: PySpark-native DAG-driven feature-generation engine.

Re-expresses ianlini/feagen's capabilities (DAG resolution, memoized
checkpoints, bundle concatenation) as an as-of/windowed feature engine
over conversation-transcript tables. See SURVEY.md.
"""
from .core.spec import FeatureNode, FeatureTemplate, FeatureGenerator, will_generate, require
from .core.dag import FeatureDAG, Plan, UnknownFeatureError, AmbiguousFeatureError, CycleError
from .core.engine import Engine, RunReport
from .store.checkpoint import CheckpointStore, NaNWriteError
from .session import get_spark

__all__ = [
    "FeatureNode", "FeatureTemplate", "FeatureGenerator", "will_generate", "require",
    "FeatureDAG", "Plan", "UnknownFeatureError", "AmbiguousFeatureError", "CycleError",
    "Engine", "RunReport", "CheckpointStore", "NaNWriteError", "get_spark",
]
