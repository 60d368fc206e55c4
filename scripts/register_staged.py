"""One-shot registration tool: promote a staged operator wave into the
registry by appending a registration block that loops over the module's
``DEV_CASES`` — the (key, fn, oracle) triples the wave's tests already
verify — so the registered surface is BY CONSTRUCTION the tested one.

Why a block over DEV_CASES instead of inserting ``@register`` decorators
above each def (the r10–r13 promotion's mechanism): the decorator needed a
``NAME_ORACLE`` constant whose name is a mechanical transform of the
function name, and the r14+ waves broke that contract 16 times (e.g.
``stat_hill_tail`` keeps its SQL in ``STAT_HILL_ORACLE``), so those ops
would have been SILENTLY skipped at their registration round; rows-only
ops (oracle=None, no constant at all) were skipped too; and ``text_bleu``
assigns its constant BELOW the def, so even a matched decorator would
NameError at import (decorators evaluate at def time; the appended block
evaluates after every definition). DEV_CASES is the single source of
truth the tests pin — registration now cannot drift from it.

Idempotent: a module already carrying the block (or whose keys are in the
registry) is skipped / no-op at import.

Usage: python scripts/register_staged.py staged_r14 staged_r15 ...
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

OPS = Path(__file__).resolve().parents[1] / "parallel_mapreduce_wordcounting_spark" / "operators"

MARKER = "# -- wave registration (appended by scripts/register_staged.py) --"

BLOCK = f'''

{MARKER}
from ..registry import B_PREFIXES as _B_PREFIXES
from ..registry import REGISTRY as _REGISTRY
from ..registry import register as _register

for _case in DEV_CASES:
    # defensive unpack: preflight_staged tolerates len(case) > 3 variance,
    # so the promoted block must too — a strict 3-tuple unpack would raise
    # ValueError at package import for any future 4-element entry
    _key, _fn, _oracle = _case[0], _case[1], (_case[2] if len(_case) > 2 else None)
    if _key not in _REGISTRY:  # idempotent under re-import / re-promotion
        _register(
            _key,
            oracle=_oracle,
            tier="B" if _key.startswith(_B_PREFIXES) else "C",
        )(_fn)
del _B_PREFIXES, _REGISTRY, _register
'''


def _dev_cases_count(src: str) -> int:
    """Number of (key, fn, oracle) triples in the module's DEV_CASES
    literal — the count of keys the appended block will register."""
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "DEV_CASES" for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            return len(node.value.elts)
    return 0


def _wire_package_import(modname: str) -> None:
    """Insert ``modname`` into the package root's ``from .operators import
    (...)`` block — the second half of promotion (the registration block
    only runs when the module is imported; the r8 end-to-end probe showed
    a promoted-but-unwired module registers nothing)."""
    init = OPS.parent / "__init__.py"
    src = init.read_text()
    if f"\n    {modname},\n" in src:
        return  # already wired
    anchor = "\n    staged_r13,\n)"
    closer = "\n)"
    if anchor in src:
        src = src.replace(anchor, f"\n    staged_r13,\n    {modname},{closer}", 1)
    else:
        # later promotions: insert before the import tuple's closing paren
        # (the block ends at the first ')' on its own line after staged_r8)
        idx = src.index("staged_r8,")
        end = src.index("\n)", idx)
        src = src[:end] + f"\n    {modname}," + src[end:]
    init.write_text(src)


def promote(modname: str) -> int:
    path = OPS / f"{modname}.py"
    src = path.read_text()
    if MARKER in src:
        _wire_package_import(modname)  # heal a half-done promotion
        return 0  # already promoted
    n = _dev_cases_count(src)
    if n == 0:
        raise SystemExit(f"{modname}: no DEV_CASES literal found — nothing to promote")
    path.write_text(src + BLOCK)
    _wire_package_import(modname)
    return n


if __name__ == "__main__":
    for mod in sys.argv[1:]:
        print(mod, promote(mod))
