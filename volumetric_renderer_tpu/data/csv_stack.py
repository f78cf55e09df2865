"""CSV slice-stack reader.

Mirrors ``src/data/csv_file_parser.cpp:14-50``: each CSV file is one Z
slice; rows are Y, comma-separated values are X.  X/Y dimensions must be
consistent across rows and files ("Inconsistant dimensions" — the
reference's spelling — ``csv_file_parser.cpp:37,43``).

One deliberate fix over the reference: its running min/max starts from the
value-initialized ``Dataset{}`` (0.0), so all-positive data gets min 0 and
all-negative data gets max 0 (``csv_file_parser.cpp:16,28-29``).  Here
min/max come from the data alone; pass ``reference_minmax=True`` for
bug-compatible behavior.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from volumetric_renderer_tpu.data.volume import Volume


class CsvParseError(RuntimeError):
    pass


def read_csv_stack(paths: Sequence[str], reference_minmax: bool = False) -> Volume:
    slices: List[np.ndarray] = []
    x_dim = y_dim = None
    for path in paths:
        rows: List[np.ndarray] = []
        with open(os.fspath(path), "r") as f:
            for line in f:
                line = line.strip("\n\r")
                if line == "":
                    continue
                vals = np.array(
                    [float(v) for v in line.split(",")], dtype=np.float32
                )
                if x_dim is None:
                    x_dim = vals.size
                elif vals.size != x_dim:
                    raise CsvParseError("Inconsistant dimensions")
                rows.append(vals)
        if y_dim is None:
            y_dim = len(rows)
        elif len(rows) != y_dim:
            raise CsvParseError("Inconsistant dimensions")
        if not rows:
            raise CsvParseError("empty CSV slice")
        slices.append(np.stack(rows))

    if not slices:
        raise CsvParseError("no CSV files given")
    data = np.stack(slices)  # (Z, Y, X)
    vmin, vmax = float(data.min()), float(data.max())
    if reference_minmax:
        vmin, vmax = min(vmin, 0.0), max(vmax, 0.0)
    return Volume(data=data, vmin=vmin, vmax=vmax)
