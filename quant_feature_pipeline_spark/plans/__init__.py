from .schema_contract import schema_sha
from .checkpoint import Checkpointer
from .features_contract import assemble_features, health_check, FeatureManifest

__all__ = ["schema_sha", "Checkpointer", "assemble_features", "health_check", "FeatureManifest"]
