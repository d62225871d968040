"""Driver-contract registry invariants (__ray_entry__.py): duplicate
dict keys silently shadow (a round-2 curation_pipeline collision was
caught live), every oracle key must have a query, and every oracle-
bearing query must sit in the driver's first-50 recorded slots or be
explicitly rotated below the cap."""

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _literal_dict_keys(fn_name: str) -> list[str]:
    """Keys of the registry dict in ``fn_name`` — covers both shapes:
    ``return {...}`` and ``sql = {...}; sql["k"] = ...; return sql``
    (subscript-assigned keys count toward duplicate detection)."""
    tree = ast.parse(open(os.path.join(REPO, "__ray_entry__.py")).read())
    for node in ast.walk(tree):
        if not (isinstance(node, ast.FunctionDef) and node.name == fn_name):
            continue
        keys: list[str] = []
        found = False
        for sub in ast.walk(node):
            d = None
            if isinstance(sub, ast.Return) and \
                    isinstance(sub.value, ast.Dict):
                d = sub.value
            elif isinstance(sub, ast.Assign) and \
                    isinstance(sub.value, ast.Dict):
                d = sub.value
            if d is not None:
                found = True
                for k in d.keys:
                    assert isinstance(k, ast.Constant), \
                        f"non-literal key in {fn_name}"
                    keys.append(k.value)
            if isinstance(sub, ast.Assign) and len(sub.targets) == 1 and \
                    isinstance(sub.targets[0], ast.Subscript) and \
                    isinstance(sub.targets[0].slice, ast.Constant):
                keys.append(sub.targets[0].slice.value)
        if found:
            return keys
    raise AssertionError(f"{fn_name} literal dict not found")


def test_no_duplicate_query_keys():
    keys = _literal_dict_keys("queries")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert dupes == [], f"duplicate queries() keys (later shadows): {dupes}"


def test_no_duplicate_oracle_keys():
    keys = _literal_dict_keys("oracle_sql")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert dupes == [], f"duplicate oracle_sql() keys: {dupes}"


def test_every_oracle_has_a_query():
    q = set(_literal_dict_keys("queries"))
    o = set(_literal_dict_keys("oracle_sql"))
    missing = sorted(o - q)
    assert missing == [], f"oracle entries without a query: {missing}"


def test_function_defs_not_shadowed():
    """Two defs of the same _q_* name: the later silently wins."""
    tree = ast.parse(open(os.path.join(REPO, "__ray_entry__.py")).read())
    names = [n.name for n in tree.body
             if isinstance(n, ast.FunctionDef) and n.name.startswith("_q_")]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert dupes == [], f"shadowed query functions: {dupes}"
