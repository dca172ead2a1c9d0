"""Golden-fixture regression test (BASELINE.md 'bit-identical calls'):
the full diploid pipeline on a fixed seed must reproduce the checked-in
GLF and VCF byte-for-byte.  These fixtures pin the output conventions —
1-based VCF POS with the REF string anchored one base before the variant
(mergeOutputDiploid.py:62 via 1-based fa.get), GLF column order and float
formatting — so anchor/off-by-one regressions fail loudly instead of
hiding inside tolerance windows.

Regenerate after an INTENDED change: python tests/golden/pipeline.py
"""

import importlib.util
import os

import jax

jax.config.update("jax_enable_x64", True)

_spec = importlib.util.spec_from_file_location(
    "golden_pipeline",
    os.path.join(os.path.dirname(__file__), "golden", "pipeline.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
GOLDEN_DIR, normalize_vcf, run_pipeline, run_pooled_pipeline = (
    _mod.GOLDEN_DIR, _mod.normalize_vcf, _mod.run_pipeline,
    _mod.run_pooled_pipeline)


def test_golden_diploid_pipeline(tmp_path):
    glf, vcf = run_pipeline(str(tmp_path))
    got_glf = open(glf).read()
    got_vcf = normalize_vcf(open(vcf).read())
    want_glf = open(os.path.join(GOLDEN_DIR, "diploid.glf.txt")).read()
    want_vcf = open(os.path.join(GOLDEN_DIR, "diploid.vcf")).read()
    assert got_glf == want_glf
    assert got_vcf == want_vcf


def test_golden_pooled_pipeline(tmp_path):
    """Pins the pooled deliverable byte-for-byte: per-BAM GLF, merged
    sites VCF (all mergeOutputPooled filters), and the per-sample GL
    join (VERDICT r3 missing #3)."""
    glf, vcf, gl = run_pooled_pipeline(str(tmp_path))
    assert open(glf).read() == open(
        os.path.join(GOLDEN_DIR, "pooled.glf.txt")).read()
    assert normalize_vcf(open(vcf).read()) == open(
        os.path.join(GOLDEN_DIR, "pooled.vcf")).read()
    assert open(gl).read() == open(
        os.path.join(GOLDEN_DIR, "pooled.gl.txt")).read()
