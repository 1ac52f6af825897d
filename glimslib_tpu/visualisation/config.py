"""Reference-compatible sub-config (reference ``glimslib/visualisation/config.py``:
interactive-backend detection + temp figure dir)."""

import os

import matplotlib

from glimslib_tpu.config import output_dir

# backend detection: non-interactive when no display (reference behavior)
interactive = bool(os.environ.get("DISPLAY"))
if not interactive:
    matplotlib.use("Agg")

output_dir_tmp_figures = os.path.join(output_dir, "tmp_figures")
