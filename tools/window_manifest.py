"""Source-unit manifest for the driver-window freshness invariant.

The driver's correctness gate checks only the FIRST _WINDOW_SIZE queries
each round; the rotation rule says queries whose ENGINE PATH changed
this round go first. r10 hand-applied the rule and missed one
(lm_quality_score's broadcast pin changed its physical plan while the
row sat in _REST with an r6-last-green — VERDICT r10 "What's wrong #2").
This module makes the rule mechanical:

* every top-level def/class/constant in databus_spark/ is a UNIT with a
  formatting- and comment-insensitive hash (ast.dump, docstrings
  stripped);
* a static reference graph links units (bare names within a module,
  alias.attr across modules, from-imports, decorator expressions — so a
  registry query's oracle-SQL builder call chain is included);
* each registered query (its @query-decorated registry function) gets
  the TRANSITIVE CLOSURE of units it references;
* `tests/window_manifest.json` is the previous round's committed unit
  hashes. The contract test recomputes hashes, diffs, and asserts every
  query whose closure touches a changed unit sits inside _WINDOW (or,
  when more queries changed than the window holds, that the window is
  spent entirely on changed ones).

Regenerate at the END of a round, after _WINDOW is set, with:

    python tools/window_manifest.py

Known approximations (all conservative to the cheap side): dynamic
references (getattr, string-keyed dispatch) are invisible; a top-level
import swap is folded into a per-module ``::__imports__`` unit that
every unit in the module depends on, so alias retargeting can't slip a
behavior change past an unchanged unit hash.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os

PKG = "databus_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tests", "window_manifest.json")


def _module_files(repo: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(os.path.join(repo, PKG)):
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.relpath(os.path.join(root, f), repo))
    return sorted(out)


def _strip_docstrings(node: ast.AST) -> ast.AST:
    for child in ast.walk(node):
        if isinstance(
            child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(child, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                child.body = body[1:] or [ast.Pass()]
    return node


def _unit_hash(node: ast.AST) -> str:
    dump = ast.dump(_strip_docstrings(node), include_attributes=False)
    return hashlib.sha256(dump.encode()).hexdigest()[:16]


def _mod_to_relpath(dotted: str) -> str | None:
    """'databus_spark.operators.dedup' -> 'databus_spark/operators/dedup.py'
    (or the package __init__), None for external modules."""
    if not dotted.startswith(PKG):
        return None
    p = dotted.replace(".", "/")
    for cand in (p + ".py", p + "/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


class _Graph:
    def __init__(self) -> None:
        self.hashes: dict[str, str] = {}  # uid -> hash
        self.refs: dict[str, set[str]] = {}  # uid -> uids it references
        self.module_defs: dict[str, dict[str, str]] = {}  # relpath -> name -> uid
        self.query_units: dict[str, str] = {}  # query name -> registry uid
        self._pending: list[tuple[str, str, ast.AST, dict]] = []
        self._patches: list[tuple[str, str]] = []  # (query name, patch uid)

    # -- pass 1: units + import tables ------------------------------------
    def add_module(self, relpath: str) -> None:
        src = open(os.path.join(REPO, relpath)).read()
        tree = ast.parse(src)
        defs: dict[str, str] = {}
        imports: dict[str, tuple[str, str]] = {}  # alias -> (kind, target)
        import_nodes: list[ast.AST] = []
        tail: list[ast.AST] = []  # top-level statements outside any unit

        for node in tree.body:
            if isinstance(node, ast.Import):
                import_nodes.append(node)
                for a in node.names:
                    rel = _mod_to_relpath(a.name)
                    if rel:
                        imports[a.asname or a.name.split(".")[0]] = ("module", rel)
            elif isinstance(node, ast.ImportFrom):
                import_nodes.append(node)
                base = node.module or ""
                for a in node.names:
                    alias = a.asname or a.name
                    rel = _mod_to_relpath(f"{base}.{a.name}")
                    if rel:  # `from pkg.x import y` where y is a module
                        imports[alias] = ("module", rel)
                    else:
                        parent = _mod_to_relpath(base)
                        if parent:  # y is a unit inside pkg/x.py
                            imports[alias] = ("unit", f"{parent}::{a.name}")
            elif isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                uid = f"{relpath}::{node.name}"
                defs[node.name] = uid
                self.hashes[uid] = _unit_hash(node)
                self._pending.append((uid, relpath, node, imports))
                if relpath.endswith("registry.py"):
                    qname = _query_decorator_name(node)
                    if qname:
                        self.query_units[qname] = uid
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = node.targets if isinstance(node, ast.Assign) else [node.target]
                named = [t.id for t in targets if isinstance(t, ast.Name)]
                if named:
                    for name in named:
                        uid = f"{relpath}::{name}"
                        defs[name] = uid
                        self.hashes[uid] = _unit_hash(node)
                        self._pending.append((uid, relpath, node, imports))
                elif (
                    isinstance(node, ast.Assign)
                    and len(targets) == 1
                    and isinstance(targets[0], ast.Subscript)
                    and isinstance(targets[0].value, ast.Name)
                    and targets[0].value.id in ("QUERIES", "ORACLES")
                    and isinstance(targets[0].slice, ast.Constant)
                ):
                    # registry patch like ORACLES["zorder_events_key"] = ...
                    qname = targets[0].slice.value
                    uid = f"{relpath}::{targets[0].value.id}[{qname}]"
                    self.hashes[uid] = _unit_hash(node)
                    self._pending.append((uid, relpath, node, imports))
                    # tie the patch to the query's own unit (in resolve(),
                    # after every def has been seen)
                    self._patches.append((qname, uid))
                else:
                    tail.append(node)
            elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
                pass  # module docstring
            else:
                tail.append(node)

        # imports + loose top-level statements: one per-module unit every
        # unit in the module depends on (an import swap must not slip by)
        imp_uid = f"{relpath}::__imports__"
        self.hashes[imp_uid] = hashlib.sha256(
            "\n".join(
                ast.dump(_strip_docstrings(n), include_attributes=False)
                for n in (*import_nodes, *tail)
            ).encode()
        ).hexdigest()[:16]
        self.module_defs[relpath] = defs

    # -- pass 2: resolve references ----------------------------------------
    def resolve(self) -> None:
        for qname, patch_uid in self._patches:
            q_uid = self.query_units.get(qname)
            if q_uid:
                self.refs.setdefault(q_uid, set()).add(patch_uid)
        for uid, relpath, node, imports in self._pending:
            out = self.refs.setdefault(uid, set())
            out.add(f"{relpath}::__imports__")
            local_imports = dict(imports)
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom):  # function-local import
                    base = sub.module or ""
                    for a in sub.names:
                        alias = a.asname or a.name
                        rel = _mod_to_relpath(f"{base}.{a.name}")
                        if rel:
                            local_imports[alias] = ("module", rel)
                        else:
                            parent = _mod_to_relpath(base)
                            if parent:
                                local_imports[alias] = ("unit", f"{parent}::{a.name}")
                elif isinstance(sub, ast.Import):
                    for a in sub.names:
                        rel = _mod_to_relpath(a.name)
                        if rel:
                            local_imports[a.asname or a.name.split(".")[0]] = (
                                "module",
                                rel,
                            )
            for sub in ast.walk(node):
                if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
                    tgt = local_imports.get(sub.value.id)
                    if tgt and tgt[0] == "module":
                        ref = self.module_defs.get(tgt[1], {}).get(sub.attr)
                        if ref:
                            out.add(ref)
                        out.add(f"{tgt[1]}::__imports__")
                elif isinstance(sub, ast.Name):
                    ref = self.module_defs.get(relpath, {}).get(sub.id)
                    if ref and ref != uid:
                        out.add(ref)
                    tgt = local_imports.get(sub.id)
                    if tgt and tgt[0] == "unit":
                        out.add(tgt[1])

    def closure(self, uid: str) -> set[str]:
        seen: set[str] = set()
        stack = [uid]
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(self.refs.get(u, ()))
        return seen

    def query_closures(self) -> dict[str, set[str]]:
        return {q: self.closure(uid) for q, uid in self.query_units.items()}


def _query_decorator_name(node: ast.AST) -> str | None:
    for dec in getattr(node, "decorator_list", []):
        if (
            isinstance(dec, ast.Call)
            and isinstance(dec.func, ast.Name)
            and dec.func.id == "query"
            and dec.args
            and isinstance(dec.args[0], ast.Constant)
        ):
            return dec.args[0].value
    return None


def build_graph() -> _Graph:
    g = _Graph()
    for rel in _module_files(REPO):
        g.add_module(rel)
    g.resolve()
    return g


def affected_queries(graph: _Graph, manifest_units: dict[str, str]) -> set[str]:
    """Queries whose closure touches any unit that is new or whose hash
    differs from the committed manifest."""
    changed = {
        uid for uid, h in graph.hashes.items() if manifest_units.get(uid) != h
    }
    return {
        q for q, cl in graph.query_closures().items() if cl & changed
    }


def generate() -> dict:
    g = build_graph()
    data = {
        "units": dict(sorted(g.hashes.items())),
        "queries": sorted(g.query_units),
    }
    with open(MANIFEST, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    return data


if __name__ == "__main__":
    d = generate()
    print(f"wrote {MANIFEST}: {len(d['units'])} units, {len(d['queries'])} queries")
