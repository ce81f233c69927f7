"""Static scan-discipline gate: every ``read_parquet`` in the package
must prune columns at the read (columns=[...]) — at 100TB a scan that
loads all columns for a 2-column transform is wrong.  Whole-table
loaders are allowlisted explicitly so a new unpruned scan fails review
here instead of in a cluster bill."""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "knowledge_graph_ray"

# (filename, enclosing function) pairs that legitimately read every
# column: generic loaders and whole-row helpers whose callers consume
# the full schema.
ALLOWLIST = {
    ("queries.py", "_docs"),          # documents: text + all metadata used
    ("queries.py", "_emb"),           # embeddings: id + full vector used
    ("io.py", "read_documents"),      # generic loader, caller projects
    ("checkpoint.py", "read_checkpoint"),  # checkpoints are written with
                                           # exactly the columns consumed
}


def _violations():
    bad = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        # annotate parents to find the enclosing function of each call
        stack = []

        def visit(node):
            is_fn = isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            if is_fn:
                stack.append(node.name)
            if isinstance(node, ast.Call):
                fn = node.func
                name = getattr(fn, "attr", getattr(fn, "id", ""))
                if name == "read_parquet":
                    has_cols = any(k.arg == "columns" for k in node.keywords)
                    if not has_cols:
                        enclosing = stack[-1] if stack else "<module>"
                        if (path.name, enclosing) not in ALLOWLIST:
                            bad.append(f"{path.name}:{node.lineno} in "
                                       f"{enclosing}()")
            for child in ast.iter_child_nodes(node):
                visit(child)
            if is_fn:
                stack.pop()

        visit(tree)
    return bad


def test_every_parquet_scan_prunes_columns():
    bad = _violations()
    assert not bad, (
        "read_parquet without columns= (prune at the read, or allowlist "
        "a deliberate whole-table loader): " + "; ".join(bad)
    )
