from .schema_contract import schema_sha
from .checkpoint import Checkpointer
from .features_contract import assemble_features, health_check, FeatureManifest
from .flagship import FlagshipStats, run_flagship, flagship_feature_names

__all__ = [
    "schema_sha",
    "Checkpointer",
    "assemble_features",
    "health_check",
    "FeatureManifest",
    "FlagshipStats",
    "run_flagship",
    "flagship_feature_names",
]
