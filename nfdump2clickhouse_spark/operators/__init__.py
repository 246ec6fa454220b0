"""SURVEY §2 operator inventory, grouped by family.

Importing this package registers every query key in the registry.
"""

from . import aggregations  # noqa: F401
from . import ann  # noqa: F401
from . import behavior  # noqa: F401
from . import curation  # noqa: F401
from . import dedup_extra  # noqa: F401
from . import flows_analytics  # noqa: F401
from . import joins  # noqa: F401
from . import llm_pipeline  # noqa: F401
from . import multimodal  # noqa: F401
from . import text_extra  # noqa: F401
from . import relational  # noqa: F401
from . import reshape  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import scans  # noqa: F401
from . import time_windows  # noqa: F401
from . import udfs  # noqa: F401
from . import windows  # noqa: F401
