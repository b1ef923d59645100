"""Config file IO that works both from a filesystem checkout and from
inside a --py-files zip artifact (zipimport paths look like
.../osmzen_spark.zip/osmzen_spark/config/engine.yaml, which plain
open() cannot read)."""

from __future__ import annotations

import os
import zipfile


def read_text(path: str) -> str:
    if os.path.exists(path):
        with open(path) as f:
            return f.read()
    # zip-member path: locate the .zip ancestor and read the member
    parts = path.replace("\\", "/").split("/")
    for i, seg in enumerate(parts):
        if seg.endswith((".zip", ".egg")):
            zip_path = "/".join(parts[: i + 1])
            member = "/".join(parts[i + 1 :])
            if os.path.exists(zip_path):
                with zipfile.ZipFile(zip_path) as z:
                    return z.read(member).decode("utf-8")
    raise FileNotFoundError(path)
