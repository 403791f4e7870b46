"""Manuscript-layer analog: artifacts → figures → compiled report (L6).

The reference's final build layer is a showyourwork/tectonic manuscript
(``src/tex/ms.tex``) whose figures are bound to pipeline scripts.  A
framework is not a paper repository, but the *capability* — turn a finished
pipeline run into a compiled, figure-bound document — is reproduced here:

* ``ms.tex`` — an article-class LaTeX source with the posterior summary
  tables and all rendered figures bound by ``\\includegraphics`` (compilable
  with any TeX engine; none ships in this environment);
* ``ms.md`` — the same content as Markdown;
* ``report.pdf`` — a compiled multi-page PDF built directly with matplotlib
  (title + summary tables, then one page per figure), so a finished document
  exists even without TeX.

Reference: ``ms.tex:45-108`` figure bindings, ``showyourwork.yml:97-111``.
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.image as mpimg
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.backends.backend_pdf import PdfPages

__all__ = ["generate_report"]

_TITLE = "Calibrated Cosmography With a Physical Model of the Black Hole Mass Function"
_SUBTITLE = "bumpcosmology_tpu pipeline report"


def _trace_summary_rows(trace_path):
    from bumpcosmology_tpu.utils.trace import load_trace

    tr = load_trace(trace_path)
    rows = []
    for site, s in tr.summary().items():
        rows.append(
            (site, f"{s['mean']:.3f}", f"{s['sd']:.3f}",
             f"[{s['q5']:.3f}, {s['q95']:.3f}]", f"{s['rhat']:.3f}", f"{s['ess']:.0f}")
        )
    return rows


def _tex_table(rows):
    head = "site & mean & sd & 90\\% CI & $\\hat R$ & ESS \\\\\\hline\n"
    body = "\n".join(" & ".join(r).replace("_", "\\_") + " \\\\" for r in rows)
    return (
        "\\begin{tabular}{lrrrrr}\n\\hline\n" + head + body + "\n\\hline\n\\end{tabular}\n"
    )


def _md_table(rows):
    out = ["| site | mean | sd | 90% CI | R-hat | ESS |", "|---|---|---|---|---|---|"]
    out += ["| " + " | ".join(r) + " |" for r in rows]
    return "\n".join(out)


def generate_report(cfg, out_dir="report"):
    """Render figures + write ms.tex / ms.md / report.pdf; returns paths."""
    from bumpcosmology_tpu.figures.plots import render_all

    out_dir = Path(out_dir)
    fig_dir = out_dir / "figures"
    out_dir.mkdir(parents=True, exist_ok=True)
    figures = render_all(cfg, out_dir=fig_dir, skip_missing=True, fmt="png")

    sections = []
    for name, artifact in (("population fit", "trace.h5"), ("joint cosmology fit", "trace_cosmo.h5")):
        p = Path(cfg.paths.path(artifact))
        if p.exists():
            sections.append((name, _trace_summary_rows(p)))

    # --- LaTeX source (reference ms.tex analog; compilable by any engine)
    tex = [
        "\\documentclass{article}",
        "\\usepackage{graphicx}",
        f"\\title{{{_TITLE}\\\\\\large {_SUBTITLE}}}",
        "\\begin{document}\\maketitle",
    ]
    for name, rows in sections:
        tex += [f"\\section*{{Posterior summary: {name}}}", _tex_table(rows)]
    for f in figures:
        stem = f.stem.replace("_", "\\_")
        tex += [
            "\\begin{figure}[p]\\centering",
            f"\\includegraphics[width=0.9\\textwidth]{{figures/{f.name}}}",
            f"\\caption{{{stem}}}\\end{{figure}}",
        ]
    tex.append("\\end{document}")
    (out_dir / "ms.tex").write_text("\n".join(tex))

    # --- Markdown
    md = [f"# {_TITLE}", f"*{_SUBTITLE}*", ""]
    for name, rows in sections:
        md += [f"## Posterior summary: {name}", "", _md_table(rows), ""]
    md += ["## Figures", ""]
    md += [f"![{f.stem}](figures/{f.name})" for f in figures]
    (out_dir / "ms.md").write_text("\n".join(md))

    # --- Compiled PDF via matplotlib (no TeX engine required)
    pdf_path = out_dir / "report.pdf"
    with PdfPages(pdf_path) as pdf:
        fig = plt.figure(figsize=(8.5, 11))
        fig.text(0.5, 0.92, _TITLE, ha="center", fontsize=13, wrap=True)
        fig.text(0.5, 0.88, _SUBTITLE, ha="center", fontsize=10, style="italic")
        y = 0.82
        for name, rows in sections:
            fig.text(0.1, y, f"Posterior summary: {name}", fontsize=11, weight="bold")
            y -= 0.02
            ax = fig.add_axes([0.08, max(y - 0.023 * (len(rows) + 1), 0.03), 0.84, 0.023 * (len(rows) + 1)])
            ax.set_axis_off()
            table = ax.table(
                cellText=[list(r) for r in rows],
                colLabels=["site", "mean", "sd", "90% CI", "R-hat", "ESS"],
                loc="center",
            )
            table.auto_set_font_size(False)
            table.set_fontsize(7)
            y -= 0.024 * (len(rows) + 1) + 0.04
        pdf.savefig(fig)
        plt.close(fig)
        for f in figures:
            fig = plt.figure(figsize=(8.5, 11))
            ax = fig.add_axes([0.05, 0.08, 0.9, 0.84])
            ax.set_axis_off()
            ax.imshow(mpimg.imread(f))
            fig.text(0.5, 0.04, f.stem, ha="center", fontsize=10)
            pdf.savefig(fig)
            plt.close(fig)

    return {"tex": out_dir / "ms.tex", "md": out_dir / "ms.md", "pdf": pdf_path}
