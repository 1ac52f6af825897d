"""Reference-compatible sub-config (reference
``glimslib/optimization_workflow/config.py``)."""

from glimslib_tpu.config import *  # noqa: F401,F403
from glimslib_tpu.config import output_dir, USE_ADJOINT  # noqa: F401
