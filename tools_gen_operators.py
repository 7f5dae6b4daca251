"""Generate OPERATORS.md: the full operator inventory from the query
registry — name, category, oracle coverage, and the docstring's scale
notes. Run: python tools_gen_operators.py"""
import sys, textwrap
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
from glue_etl_framework_spark.queries import load_registry

reg = load_registry()
by_cat = {}
for name, spec in sorted(reg.items()):
    by_cat.setdefault(spec.category, []).append(spec)

out = ["# OPERATORS — the engine's query inventory",
       "",
       f"{len(reg)} named operators, every one a `queries()` entry in the driver",
       "contract; those marked `oracle` are differentially hash-checked against",
       "DuckDB at sf0.01 (all of them, currently). Descriptions are the",
       "implementation docstrings — each includes its scale rationale.",
       ""]
for cat in sorted(by_cat):
    out.append(f"## {cat} ({len(by_cat[cat])})")
    out.append("")
    for spec in by_cat[cat]:
        oracle = "oracle" if spec.oracle else "rows-only"
        doc = " ".join((spec.fn.__doc__ or "").split())
        out.append(f"### `{spec.name}` [{oracle}]")
        out.append("")
        out.extend(textwrap.wrap(doc, width=80))
        out.append("")
Path("OPERATORS.md").write_text("\n".join(out))
print(f"wrote OPERATORS.md: {len(reg)} operators, {len(by_cat)} categories")
