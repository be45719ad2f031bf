"""Auxiliary-file plumbing: datalists, .nav/.tid/.mst/.sta sidecars,
navigation extraction from SEG-Y headers.

reference: pseudo_3D_interpolation/functions/utils_IO.py. The input contract
is preserved: a "path" may be (a) a single SEG-Y file, (b) a directory
(with optional prefix/suffix filters), or (c) a ``.txt`` datalist of
relative filenames. Sidecar files are CSVs named after the profile with a
different suffix.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

from .headers import scale_coordinates
from .segy import SegyFile

SEGY_SUFFIXES = (".sgy", ".segy")


def resolve_input_files(path, fsuffix: str = "sgy", fnprefix: str | None = None,
                        fnsuffix: str | None = None) -> list[str]:
    """Resolve a file / directory / datalist input into a file list
    (shared stage-1 input contract; reference utils_IO.py:58-126)."""
    if isinstance(path, (list, tuple)):
        return [str(p) for p in path]
    path = str(path)
    if os.path.isdir(path):
        pat = fsuffix if fsuffix.startswith(".") else "." + fsuffix
        # glob.escape: a directory named cruise[2020] must not become a
        # character class. The default 'sgy' also matches '.segy' — both
        # spellings are standard (SEGY_SUFFIXES).
        pats = SEGY_SUFFIXES if pat == ".sgy" else (pat,)
        files = sorted(
            f for p in pats
            for f in glob.glob(os.path.join(glob.escape(path), f"*{p}")))
        if fnprefix:
            files = [f for f in files if os.path.basename(f).startswith(fnprefix)]
        if fnsuffix:
            files = [
                f for f in files
                if os.path.splitext(os.path.basename(f))[0].endswith(fnsuffix)
            ]
        return files
    if os.path.isfile(path) and path.endswith(".txt"):
        base = os.path.dirname(path)
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                out.append(line if os.path.isabs(line) else os.path.join(base, line))
        return out
    if os.path.isfile(path):
        return [path]
    raise IOError(f"Invalid input path {path!r}: not a file, directory, or datalist")


def line_name(filepath: str, splitter: str = "UTM") -> str:
    """Derive the original line name from a filename: everything before the
    first '_'-separated token containing ``splitter``
    (reference utils_IO.py:14-55)."""
    base = os.path.splitext(os.path.basename(filepath))[0]
    parts = base.split("_")
    for i, p in enumerate(parts):
        if splitter in p:
            # splitter-first names ('UTM33N_line1') would derive the empty
            # string and collapse DISTINCT profiles onto one (line, tracl)
            # key, silently mis-joining sidecars — fall back to the full
            # stem instead (deviation: the reference returns '' here,
            # utils_IO.py:47-51)
            return "_".join(parts[:i]) if i > 0 else base
    return base


def aux_path(segy_path: str, suffix: str) -> str:
    """Sidecar path for a profile (same basename, different suffix)."""
    suffix = suffix if suffix.startswith(".") else "." + suffix
    return os.path.splitext(segy_path)[0] + suffix


def write_aux(segy_path: str, suffix: str, df: pd.DataFrame) -> str:
    """Write a sidecar CSV (.nav/.tid/.mst/.sta/...)."""
    p = aux_path(segy_path, suffix)
    df.to_csv(p, index=False)
    return p


def read_auxiliary_files(path, fsuffix: str, prefix: str | None = None,
                         suffix: str | None = None,
                         index_cols=("line", "tracl"),
                         splitter: str = "UTM") -> pd.DataFrame | None:
    """Read + merge sidecar CSVs into one DataFrame keyed by (line, tracl)."""
    fs = fsuffix if fsuffix.startswith(".") else "." + fsuffix
    if os.path.isdir(str(path)):
        # same directory-scan contract as resolve_input_files — one source
        # of truth for the prefix/suffix filter semantics
        files = resolve_input_files(str(path), fsuffix=fs, fnprefix=prefix,
                                    fnsuffix=suffix)
    else:
        segys = resolve_input_files(path)
        files = [aux_path(p, fs) for p in segys]
        files = [f for f in files if os.path.exists(f)]
    if not files:
        return None
    frames = []
    for f in files:
        df = pd.read_csv(f)
        df["line"] = line_name(f, splitter)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    if index_cols:
        out = out.set_index(list(index_cols), drop=True)
    return out


def export_coords(df: pd.DataFrame, out_path: str, fmt: str | None = None) -> str:
    """Export navigation coordinates to CSV or GeoJSON
    (reference utils_IO.py:129-187; GeoJSON replaces the geopandas path —
    plain-text, no GEOS dependency)."""
    fmt = fmt or ("geojson" if out_path.endswith((".geojson", ".json")) else "csv")
    if fmt == "csv":
        df.to_csv(out_path, index=False)
        return out_path
    if fmt != "geojson":
        raise ValueError("fmt must be 'csv' or 'geojson'")
    import json

    features = []
    if "line" in df.columns:
        for line, grp in df.groupby("line"):
            coords = [[float(x), float(y)] for x, y in zip(grp["x"], grp["y"])]
            features.append({
                "type": "Feature",
                "properties": {"line": str(line), "n_traces": len(grp)},
                "geometry": {"type": "LineString", "coordinates": coords},
            })
    else:
        for _, row in df.iterrows():
            features.append({
                "type": "Feature",
                # .item() numpy scalars: json.dump rejects np.int64 (rows
                # only carry Python scalars when pandas happened to
                # object-upcast — don't rely on it)
                "properties": {k: (None if pd.isna(v) else
                                   v.item() if hasattr(v, "item") else v)
                               for k, v in row.items()
                               if k not in ("x", "y")},
                "geometry": {"type": "Point",
                             "coordinates": [float(row["x"]), float(row["y"])]},
            })
    with open(out_path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)
    return out_path


def extract_navigation(path, fsuffix: str = "sgy", fnprefix=None, fnsuffix=None,
                       splitter: str = "UTM", src_coords_bytes=(73, 77),
                       write_sidecars: bool = False) -> pd.DataFrame:
    """Scrape per-trace navigation (x, y, tracl, line) from SEG-Y headers
    (reference utils_IO.py:190-293)."""
    files = resolve_input_files(path, fsuffix, fnprefix, fnsuffix)
    frames = []
    for p in files:
        with SegyFile(p) as f:
            x, y, _ = scale_coordinates(f, src_coords_bytes)
            tracl = f.header("TRACE_SEQUENCE_FILE")
            if not tracl.any():
                tracl = np.arange(1, f.n_traces + 1)
        df = pd.DataFrame({"tracl": tracl, "x": x, "y": y})
        df["line"] = line_name(p, splitter)
        df["file"] = p
        if write_sidecars:
            write_aux(p, ".nav", df[["tracl", "x", "y"]])
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no SEG-Y files found under {path!r}")
    return pd.concat(frames, ignore_index=True)
