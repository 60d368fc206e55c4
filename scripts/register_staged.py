"""One-shot registration tool: promote a staged operator wave into the
registry by inserting ``@register(...)`` decorators above each top-level
operator def whose ``NAME_ORACLE`` constant exists in the same module, plus
the ``from ..registry import register`` import.

Why a tool instead of 49 hand edits: the r10–r13 promotion touches every
operator in four files, and a hand-typed decorator with a mismatched
oracle-constant name would silently register the wrong SQL (the constant
names are mechanical transforms of the function names, so generate them).
Idempotent: a def that already has a decorator line above it is skipped.

Usage: python scripts/register_staged.py staged_r10 staged_r11 ...
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

OPS = Path(__file__).resolve().parents[1] / "parallel_mapreduce_wordcounting_spark" / "operators"

# tier convention from the registered surface: LLM-pipeline-ish prefixes are
# tier B, relational/statistical/eventing are tier C (display metadata only)
B_PREFIXES = ("sim_", "dedup_", "text_", "dq_", "pipeline_", "mm_", "scan_", "sample_", "graph_")


def promote(modname: str) -> int:
    path = OPS / f"{modname}.py"
    src = path.read_text()
    lines = src.splitlines(keepends=True)
    out: list[str] = []
    n = 0
    for line in lines:
        m = re.match(r"def ([a-z][a-z0-9_]*)\(\s*$|def ([a-z][a-z0-9_]*)\(spark", line)
        if m:
            name = m.group(1) or m.group(2)
            const = f"{name.upper()}_ORACLE"
            # scan UP past any existing decorators: a def carrying another
            # decorator between @register and itself must not get a second
            # @register (duplicate-key ValueError at import)
            j = len(out) - 1
            while j >= 0 and out[j].lstrip().startswith("@"):
                j -= 1
            already = any(
                o.startswith("@register(") for o in out[j + 1 :]
            )
            if not already and not name.startswith("_") and re.search(
                rf"^{const}\b", src, re.M
            ):
                tier = "B" if name.startswith(B_PREFIXES) else "C"
                out.append(f'@register("{name}", oracle={const}, tier="{tier}")\n')
                n += 1
        out.append(line)
    new = "".join(out)
    if n and "from ..registry import register" not in new:
        nl = new.splitlines(keepends=True)
        # insert after the last SINGLE-LINE relative import (a line opening
        # a parenthesized import list must not swallow the insert); if the
        # module has none, fall back to just after the module docstring /
        # __future__ block by inserting before the first def/class
        candidates = [
            i
            for i, l in enumerate(nl)
            if l.startswith("from .") and "(" not in l
        ]
        if candidates:
            at = candidates[-1] + 1
        else:
            at = next(
                (i for i, l in enumerate(nl) if l.startswith(("def ", "class ", "@"))),
                len(nl),
            )
        nl.insert(at, "from ..registry import register\n")
        new = "".join(nl)
    path.write_text(new)
    return n


if __name__ == "__main__":
    for mod in sys.argv[1:]:
        print(mod, promote(mod))
