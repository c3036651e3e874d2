"""Meta-test: guard against silently-shadowed duplicate test definitions.

Round-3 VERDICT Weak #4: `test_kd_train_step_with_distillation_nms` was
defined twice in tests/test_trainer.py; Python keeps only the second def,
pytest reports no error, and the first variant never ran. Duplicate defs
are invisible at collection time (the module object already lost the
first one), so this guard parses the SOURCE with ast and fails on any
test file where a test name (module-level function or class method) is
defined more than once.
"""
import ast
import pathlib

TESTS_DIR = pathlib.Path(__file__).parent


def _duplicate_test_names(tree, path):
    dups = []

    def scan(body, scope):
        seen = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("test"):
                    if node.name in seen:
                        dups.append(
                            f"{path}:{node.lineno} duplicate {scope}"
                            f"{node.name} (first def at line "
                            f"{seen[node.name]} is shadowed and never runs)"
                        )
                    else:
                        seen[node.name] = node.lineno
            elif isinstance(node, ast.ClassDef) and node.name.startswith(
                "Test"
            ):
                scan(node.body, f"{node.name}.")

    scan(tree.body, "")
    return dups


def test_no_shadowed_duplicate_test_defs():
    problems = []
    for path in sorted(TESTS_DIR.glob("test_*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        problems.extend(_duplicate_test_names(tree, path.name))
    assert not problems, "\n".join(problems)


def test_guard_detects_a_deliberate_duplicate():
    src = "def test_x():\n    pass\n\ndef test_x():\n    pass\n"
    dups = _duplicate_test_names(ast.parse(src), "fake.py")
    assert len(dups) == 1 and "test_x" in dups[0]
