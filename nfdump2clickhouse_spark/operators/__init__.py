"""SURVEY §2 operator inventory, grouped by family.

Importing this package registers every query key in the registry.
"""

from . import aggregations  # noqa: F401
from . import joins  # noqa: F401
from . import relational  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import windows  # noqa: F401
