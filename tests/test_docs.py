"""Docs build test (VERDICT r1 item 10): the docs actually build, and
api.rst's autodoc coverage spans every public module of the package
(mirroring /root/reference/docs/index.rst:33-45's full-package autodoc)."""
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "docs"))


def test_docs_build(tmp_path):
    import build as docs_build

    outdir = str(tmp_path / "html")
    mods = docs_build.build(outdir)
    assert os.path.exists(os.path.join(outdir, "index.html"))
    for modname in mods:
        page = os.path.join(outdir, modname.replace(".", "_") + ".html")
        assert os.path.exists(page), modname
        # pages carry real content, not empty shells
        assert os.path.getsize(page) > 200, modname


def test_api_rst_covers_every_public_module():
    import build as docs_build

    documented = set(docs_build.automodules())
    public = set()
    for path in glob.glob(os.path.join(REPO, "gpu_se_tpu", "**", "*.py"),
                          recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = rel[:-3].replace(os.sep, ".")
        if mod.endswith("__init__"):
            continue
        public.add(mod)
    missing = public - documented
    assert not missing, f"modules missing from docs/api.rst: {sorted(missing)}"


def test_latex_build(tmp_path):
    """LaTeX parity with the reference docs target (the reference's
    Sphinx config compiles to the thesis PDF appendix,
    /root/reference/docs/conf.py): build_latex emits a complete .tex
    with a section per documented module."""
    import build as docs_build

    tex_path = docs_build.build_latex(str(tmp_path / "latex"))
    assert os.path.exists(tex_path)
    tex = open(tex_path).read()
    assert tex.strip().startswith("\\documentclass")
    assert tex.strip().endswith("\\end{document}")
    for modname in docs_build.automodules():
        assert modname.split(".")[-1].replace("_", "\\_") in tex, modname
