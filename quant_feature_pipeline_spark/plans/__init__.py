from .schema_contract import schema_sha
from .checkpoint import Checkpointer

__all__ = ["schema_sha", "Checkpointer"]
