"""Generate docs/cli.md — the complete per-subcommand `p3d` option
reference — straight from the argparse definitions, so the document can
never drift from the code. Re-run after CLI changes:

    JAX_PLATFORMS=cpu python tools/gen_cli_docs.py

The terminal width is pinned inside render() (argparse wraps help text
to the terminal), so the output is byte-stable regardless of where it
runs; tests/test_cli.py::test_cli_reference_doc_in_sync re-renders
through the same function and diffs against the committed file.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """\
# `p3d` CLI reference

One subcommand per workflow step (each also answers to its numbered
alias, e.g. `p3d 05-static`), plus `qc`, `nav`, `run`, `warmup`, and
`version`. The option help strings name the reference flag each option
maps to (see docs/migration.md for the command map and
docs/workflow.md for the YAML formats).

GENERATED FILE — edit the argparse definitions in
`pseudo_3d_interpolation_tpu/cli.py` and re-run
`python tools/gen_cli_docs.py` instead of editing this document.
"""


def render() -> str:
    """The full document text (terminal width pinned to 80 columns)."""
    prior = os.environ.get("COLUMNS")
    os.environ["COLUMNS"] = "80"
    try:
        from pseudo_3d_interpolation_tpu.cli import build_parser

        parser = build_parser()
        sub = next(a for a in parser._actions
                   if a.__class__.__name__ == "_SubParsersAction")
        out = io.StringIO()
        out.write(HEADER)
        seen = set()
        for name, sp in sub.choices.items():
            if id(sp) in seen:  # numbered aliases share the parser object
                continue
            seen.add(id(sp))
            out.write(f"\n## `p3d {name}`\n\n")
            out.write("```text\n" + sp.format_help().rstrip() + "\n```\n")
        return out.getvalue()
    finally:
        if prior is None:
            os.environ.pop("COLUMNS", None)
        else:
            os.environ["COLUMNS"] = prior


def main() -> None:
    text = render()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "cli.md")
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
