from . import catalog_docs  # noqa: F401  (registers queries)
from . import catalog_emb  # noqa: F401
from . import catalog_mm  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_windows  # noqa: F401
from .catalog import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
