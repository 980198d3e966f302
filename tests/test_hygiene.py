"""Suite hygiene guards.

Round-3 VERDICT (weak #6): two ``def test_with_noise_short`` in one
module silently shadowed each other — Python keeps only the last
definition, so the first never ran. This meta-test makes any future
name collision a loud failure instead of a silent coverage hole.
"""
import ast
import pathlib

TESTS_DIR = pathlib.Path(__file__).parent


def test_no_shadowed_test_names():
    offenders = {}
    for path in sorted(TESTS_DIR.glob("test_*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen = {}
        # top-level functions and methods within top-level classes
        scopes = [("", tree.body)] + [
            (node.name + ".", node.body)
            for node in tree.body
            if isinstance(node, ast.ClassDef)
        ]
        for prefix, body in scopes:
            for node in body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    name = prefix + node.name
                    if name.split(".")[-1].startswith("test"):
                        if name in seen:
                            offenders.setdefault(path.name, []).append(
                                f"{name} (lines {seen[name]} and {node.lineno})"
                            )
                        seen[name] = node.lineno
    assert not offenders, f"shadowed test definitions: {offenders}"
