#!/usr/bin/env python3
"""Generate INDEX.md — the greppable one-line-per-query operator
inventory (VERDICT r12 Next #7, after the q61 re-invention near-miss).

For every `"qNNN_name" -> (qFn _)` entry in the three query files,
emit one line:

  qNNN_name | file:line | [[operator refs from the scaladoc]] | doc gist

Builder rule (also stated in INDEX.md's header): BEFORE building any
"new" operator, `grep -i <concept> INDEX.md` — if a line matches, the
operator exists; extend it instead of re-deriving it.

Run from the repo root: python3 tools/gen_index.py > INDEX.md
"""
import re
import sys

FILES = [
    "src/main/scala/graft/queries/Relational.scala",
    "src/main/scala/graft/queries/RecipeQueries.scala",
    "src/main/scala/graft/queries/OpsQueries.scala",
]

ENTRY = re.compile(r'"(q\d+[a-z0-9_]*)"\s*->\s*\((q\w+)\s+_\)')
INLINE = re.compile(r'"(q\d+[a-z0-9_]*)"\s*->\s*\(\(')


def scaladoc_above(lines, def_idx):
    """Collect the /** ... */ block ending immediately above def_idx."""
    i = def_idx - 1
    # skip blank lines and line comments between doc and def
    while i >= 0 and (not lines[i].strip() or
                      lines[i].strip().startswith("//")):
        i -= 1
    if i < 0 or not lines[i].strip().endswith("*/"):
        return ""
    out = []
    while i >= 0:
        out.append(lines[i])
        if lines[i].strip().startswith("/**"):
            break
        i -= 1
    return "\n".join(reversed(out))


def gist(doc, limit=200):
    body = re.sub(r"^\s*/?\*+/?\s?", "", doc, flags=re.M)
    body = " ".join(body.split())
    refs = sorted(set(
        r.split("]]")[0].replace("graft.ops.", "").replace(
            "graft.streaming.", "").replace("graft.plans.", "")
        for r in body.split("[[")[1:] if "]]" in r))
    text = re.sub(r"\[\[([^\]]*)\]\]", r"\1", body)
    text = text.replace("graft.ops.", "").replace(
        "graft.streaming.", "").replace("graft.plans.", "")
    if len(text) > limit:
        text = text[:limit].rsplit(" ", 1)[0] + "…"
    return refs, text


def main():
    rows = []
    for path in FILES:
        lines = open(path).read().split("\n")
        defs = {}
        for idx, ln in enumerate(lines):
            m = re.match(r"\s*(?:private\s+)?def (q\w+)\(", ln)
            if m:
                defs.setdefault(m.group(1), idx)
        for idx, ln in enumerate(lines):
            m = ENTRY.search(ln)
            name = fn = None
            if m:
                name, fn = m.group(1), m.group(2)
                at = defs.get(fn, idx)
            elif INLINE.search(ln):
                name = INLINE.search(ln).group(1)
                at = idx
            if not name:
                continue
            doc = scaladoc_above(lines, at) if fn and fn in defs else ""
            refs, text = gist(doc)
            short = path.rsplit("/", 1)[-1]
            rows.append((int(re.match(r"q(\d+)", name).group(1)), name,
                         f"{short}:{at + 1}", refs, text))
    rows.sort()
    seen = set()
    print("# INDEX — one line per gate query (generated: "
          "`python3 tools/gen_index.py > INDEX.md`)")
    print()
    print("**Builder rule: BEFORE building any \"new\" operator, "
          "`grep -i <concept>` THIS file.** A hit means the operator "
          "already exists — extend it, don't re-derive it (the q61 "
          "collocations re-invention cost round 12 several hours).")
    print()
    for num, name, loc, refs, text in rows:
        if name in seen:
            continue
        seen.add(name)
        ref = " ".join(refs) if refs else "-"
        print(f"- `{name}` | {loc} | {ref} | {text or '-'}")
    print()
    print(f"Total: {len(seen)} queries.")


if __name__ == "__main__":
    main()
