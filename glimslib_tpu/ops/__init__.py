from glimslib_tpu.ops import forms
from glimslib_tpu.ops import assembly

__all__ = ["forms", "assembly"]
