"""BIDS-style structured output paths.

Rebuild of reference ``optimization_workflow/path_io.py`` +
``path_io_config.json`` without the grabbit dependency: the same entity
scheme {processing, datasource, datatype, content, domain, frame, dim} and
the same default path pattern

    [{processing}/][{datasource}][_{datatype}][_{content}][_{domain}]
    [_{frame}][_{dim}d][.{extension}]

so directory layouts produced by both implementations match file-for-file.
"""

from __future__ import annotations

import os
from typing import Optional

from glimslib_tpu.utils import file_utils as fu

# entity order of the default path pattern (path_io_config.json:40-42)
_PATTERN_ENTITIES = (
    "datasource", "datatype", "content", "domain", "frame", "dim"
)


class PathIO:
    def __init__(self, data_root, path_to_bids_config=None):
        self.data_root = data_root
        fu.ensure_dir_exists(data_root)

    def create_path(self, abs_path=True, create=True, with_ext=True,
                    extension=None, processing=None, **entities):
        parts = []
        for name in _PATTERN_ENTITIES:
            val = entities.get(name)
            if val is None:
                continue
            sval = f"{val}d" if name == "dim" else str(val)
            parts.append(sval)
        fname = "_".join(parts)
        if extension and with_ext:
            fname = f"{fname}.{extension}"
        path = os.path.join(processing, fname) if processing else fname
        if abs_path:
            path = os.path.join(self.data_root, path)
        if create:
            fu.ensure_dir_exists(os.path.dirname(path))
        return path

    # -- typed helpers (reference path_io.py:47-77) --------------------------

    def create_image_path(self, processing, datasource, domain="full",
                          frame="reference", datatype="image", content="T1",
                          extension="mha", abs_path=True, create=True, **kw):
        return self.create_path(
            processing=processing, datasource=datasource, domain=domain,
            frame=frame, datatype=datatype, content=content,
            extension=extension, abs_path=abs_path, create=create, **kw,
        )

    def create_fenics_path(self, processing, datasource, domain="full",
                           frame="reference", datatype="fenics", content="mesh",
                           extension="h5", abs_path=True, create=True, **kw):
        return self.create_path(
            processing=processing, datasource=datasource, domain=domain,
            frame=frame, datatype=datatype, content=content,
            extension=extension, abs_path=abs_path, create=create, **kw,
        )

    def create_trafo_path(self, processing, datasource="registration",
                          domain=None, frame="ref2def", datatype="trafo",
                          content="regaffine", extension="mat", abs_path=True,
                          create=True, **kw):
        return self.create_path(
            processing=processing, datasource=datasource, domain=domain,
            frame=frame, datatype=datatype, content=content,
            extension=extension, abs_path=abs_path, create=create, **kw,
        )

    def create_params_path(self, processing, datasource="simulation",
                           domain=None, frame=None, datatype="parameterset",
                           content=None, extension="pkl", abs_path=True,
                           create=True, **kw):
        return self.create_path(
            processing=processing, datasource=datasource, domain=domain,
            frame=frame, datatype=datatype, content=content,
            extension=extension, abs_path=abs_path, create=create, **kw,
        )
