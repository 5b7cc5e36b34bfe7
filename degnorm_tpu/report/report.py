"""HTML (optionally PDF) pipeline summary report.

API mirrors reference ``report.py:9-155``: parameter/input tables, DI
distribution plots, top/bottom-N mean-DI gene coverage figures, Jinja2
template render, optional pandoc HTML->PDF conversion.
"""
from __future__ import annotations

import logging
import os
import shutil
import subprocess
from datetime import datetime
from typing import Dict, Sequence

import numpy as np
import pandas as pd

from degnorm_tpu.report.data_access import get_coverage_plots
from degnorm_tpu.report.visualizations import (
    get_di_boxplots, get_di_correlation, get_di_heatmap)

log = logging.getLogger("degnorm_tpu")

RESOURCES_DIR = os.path.join(os.path.dirname(__file__), "resources")


def render_report(data_dir: str, degnorm_data: Dict, bam_files: Sequence[str],
                  sample_ids: Sequence[str], top_n_genes: int = 5,
                  output_dir: str = ".") -> str:
    """Render report/degnorm_summary.html (+ .pdf when pandoc exists)."""
    from jinja2 import Environment, FileSystemLoader

    report_dir = os.path.join(output_dir, "report")
    os.makedirs(report_dir, exist_ok=True)

    # input-file table (report.py:30-38)
    warm = len(bam_files) == 1 and os.path.isdir(bam_files[0])
    files_df = pd.DataFrame(
        {"Warm-start directory" if warm else "Input file": list(bam_files),
         "Sample ID": list(sample_ids)[:len(bam_files)]
         if warm else list(sample_ids)})

    rho = np.asarray(degnorm_data["rho"])
    genes = list(degnorm_data["genes"])
    params_df = pd.DataFrame({
        "NMF-OA SVD iterations": [degnorm_data.get("nmf_iter")],
        "DegNorm iterations": [degnorm_data.get("degnorm_iter")],
        "Downsample rate": [f"1/{degnorm_data.get('downsample_rate')}"],
        "Number of input genes": [len(genes)],
    }).T.rename(columns={0: "value"})

    # DI plots need >1 gene and nontrivial rank (report.py:52-55)
    plots = {}
    if rho.shape[0] > 1 and np.linalg.matrix_rank(rho) > 1:
        plots["di_boxplots"] = get_di_boxplots(data_dir, save_dir=report_dir)
        plots["di_heatmap"] = get_di_heatmap(data_dir, save_dir=report_dir)
        plots["di_correlation"] = get_di_correlation(
            data_dir, save_dir=report_dir)

    # top/bottom-N mean-DI gene coverage plots (report.py:97-113)
    n = min(top_n_genes, len(genes))
    order = np.argsort(rho.mean(axis=1))
    lo_genes = [genes[i] for i in order[:n]]
    hi_genes = [genes[i] for i in order[::-1][:n]]
    try:
        hi_imgs = get_coverage_plots(hi_genes, degnorm_dir=data_dir,
                                     save_dir=data_dir)
        lo_imgs = get_coverage_plots(lo_genes, degnorm_dir=data_dir,
                                     save_dir=data_dir)
    except Exception as e:
        log.warning("coverage plots for report failed: %s", e)
        hi_imgs, lo_imgs = [], []

    env = Environment(loader=FileSystemLoader(RESOURCES_DIR))
    html = env.get_template("degnorm_report.html").render(
        timestamp=datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        files_table=files_df.to_html(index=False),
        params_table=params_df.to_html(header=False),
        di_boxplots=plots.get("di_boxplots"),
        di_heatmap=plots.get("di_heatmap"),
        di_correlation=plots.get("di_correlation"),
        hi_di_imgs=hi_imgs, lo_di_imgs=lo_imgs, top_n=n)

    html_path = os.path.join(report_dir, "degnorm_summary.html")
    with open(html_path, "w") as f:
        f.write(html)

    # optional pandoc HTML -> PDF (report.py:146-155)
    if shutil.which("pandoc"):
        pdf_path = os.path.join(report_dir, "degnorm_summary.pdf")
        try:
            subprocess.run(["pandoc", html_path, "-o", pdf_path],
                           check=True, capture_output=True, timeout=120)
            return pdf_path
        except Exception as e:
            log.warning("pandoc conversion failed: %s", e)
    return html_path
