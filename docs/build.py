"""Build the API docs.

Uses sphinx-build when Sphinx is installed (docs/conf.py is a full Sphinx
configuration, mirroring the reference's docs layer,
/root/reference/docs/conf.py + index.rst:33-45). This image ships no
Sphinx and installs are disallowed, so the fallback generator renders the
same content — the ``automodule`` directives of api.rst expanded from
live imports (module docstring + every public member's signature and
docstring) — to plain HTML. Either path produces
``docs/_build/index.html`` plus one page per documented module.

Run: ``python docs/build.py [outdir]``
"""
from __future__ import annotations

import html
import importlib
import inspect
import os
import re
import subprocess
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(DOCS)
sys.path.insert(0, REPO)


def automodules():
    """Module names from api.rst's automodule directives, in order."""
    text = open(os.path.join(DOCS, "api.rst")).read()
    return re.findall(r"^\.\. automodule:: (\S+)", text, re.M)


def _member_doc(name, obj):
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        sig = ""
    doc = inspect.getdoc(obj) or ""
    body = f"<h3><code>{html.escape(name + sig)}</code></h3>\n"
    if doc:
        body += f"<pre>{html.escape(doc)}</pre>\n"
    if inspect.isclass(obj):
        for mname, m in inspect.getmembers(obj):
            if mname.startswith("_") or not callable(m):
                continue
            if mname not in vars(obj):
                continue
            try:
                msig = str(inspect.signature(m))
            except (TypeError, ValueError):
                msig = ""
            mdoc = inspect.getdoc(m) or ""
            body += (
                f"<h4><code>.{html.escape(mname + msig)}</code></h4>\n"
                f"<pre>{html.escape(mdoc)}</pre>\n"
            )
    return body


def render_module(modname):
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{html.escape(modname)}</code></h1>"]
    if mod.__doc__:
        parts.append(f"<pre>{html.escape(inspect.cleandoc(mod.__doc__))}</pre>")
    for name, obj in inspect.getmembers(mod):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # autodoc default: only members defined here
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        parts.append(_member_doc(name, obj))
    return "\n".join(parts)


def build_fallback(outdir):
    os.makedirs(outdir, exist_ok=True)
    mods = automodules()
    links = []
    for modname in mods:
        page = modname.replace(".", "_") + ".html"
        body = render_module(modname)
        with open(os.path.join(outdir, page), "w") as fh:
            fh.write(f"<html><body>{body}</body></html>")
        links.append(f'<li><a href="{page}">{modname}</a></li>')
    index_rst = html.escape(open(os.path.join(DOCS, "index.rst")).read())
    with open(os.path.join(outdir, "index.html"), "w") as fh:
        fh.write(
            "<html><body><pre>"
            + index_rst
            + "</pre><h2>API reference</h2><ul>"
            + "".join(links)
            + "</ul></body></html>"
        )
    return mods


def build(outdir=None):
    outdir = outdir or os.path.join(DOCS, "_build")
    try:
        import sphinx  # noqa: F401

        subprocess.check_call(
            [sys.executable, "-m", "sphinx", "-b", "html", DOCS, outdir]
        )
        return automodules()
    except ImportError:
        return build_fallback(outdir)


def _tex_escape(s):
    for a, b in [("\\", r"\textbackslash{}"), ("&", r"\&"), ("%", r"\%"),
                 ("$", r"\$"), ("#", r"\#"), ("_", r"\_"), ("{", r"\{"),
                 ("}", r"\}"), ("~", r"\textasciitilde{}"),
                 ("^", r"\textasciicircum{}")]:
        s = s.replace(a, b)
    return s


def render_module_tex(modname):
    """LaTeX rendering of one module (verbatim docstrings + sections)."""
    mod = importlib.import_module(modname)
    parts = [f"\\section{{{_tex_escape(modname)}}}"]
    if mod.__doc__:
        parts.append("\\begin{verbatim}\n"
                     + inspect.cleandoc(mod.__doc__)
                     + "\n\\end{verbatim}")
    for name, obj in inspect.getmembers(mod):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = ""
        parts.append(f"\\subsection{{{_tex_escape(name + sig)}}}")
        doc = inspect.getdoc(obj) or ""
        if doc:
            parts.append("\\begin{verbatim}\n" + doc + "\n\\end{verbatim}")
    return "\n".join(parts)


def build_latex(outdir=None):
    """LaTeX target: the reference's docs compile to the thesis PDF
    appendix (/root/reference/docs/conf.py); this emits the equivalent
    gpu_se_tpu.tex (sphinx -b latex when available, else the fallback
    renderer). Returns the .tex path."""
    outdir = outdir or os.path.join(DOCS, "_build", "latex")
    os.makedirs(outdir, exist_ok=True)
    try:
        import sphinx  # noqa: F401

        subprocess.check_call(
            [sys.executable, "-m", "sphinx", "-b", "latex", DOCS, outdir]
        )
        return os.path.join(outdir, "gpu_se_tpu.tex")
    except ImportError:
        pass
    tex = [
        "\\documentclass{report}",
        "\\title{gpu\\_se\\_tpu API reference}",
        "\\begin{document}\\maketitle\\tableofcontents",
    ]
    for modname in automodules():
        tex.append(render_module_tex(modname))
    tex.append("\\end{document}")
    path = os.path.join(outdir, "gpu_se_tpu.tex")
    with open(path, "w") as fh:
        fh.write("\n".join(tex))
    return path


if __name__ == "__main__":
    mods = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"documented {len(mods)} modules")
