# Importing a method module registers it in MODEL (reference:
# model/methods/__init__.py:1-16 wires registrations via import side effects).
from . import baseline  # noqa: F401
from . import bcnn  # noqa: F401
from . import cbcnn  # noqa: F401
from . import mpn  # noqa: F401
from . import osme  # noqa: F401
from . import apinet  # noqa: F401
from . import cin  # noqa: F401
from . import crossx  # noqa: F401
from . import dcl  # noqa: F401
from . import peer_learning  # noqa: F401
from . import ntsnet  # noqa: F401
from . import s3n  # noqa: F401
from . import interp_parts  # noqa: F401
from . import mge  # noqa: F401
from . import apcnn  # noqa: F401
from . import prototree  # noqa: F401
