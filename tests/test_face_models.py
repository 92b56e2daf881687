"""Face detection (RetinaFace) + parsing (ParseNet) model tests.

Reference behavior: facexlib retinaface_resnet50 / parsenet as used by
SUPIR/utils/face_restoration_helper.py (detect_faces -> [N, 15] rows,
parse -> 19-class mask -> soft paste mask).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from supir_tpu.models.retinaface import (
    MIN_SIZES,
    STEPS,
    RetinaFace,
    RetinaFaceDetector,
    decode_boxes,
    decode_landmarks,
    nms,
    prior_boxes,
)


def test_prior_boxes_count_and_range():
    priors = prior_boxes((640, 640))
    expected = sum(
        (-(-640 // s)) ** 2 * len(ms) for s, ms in zip(STEPS, MIN_SIZES)
    )
    assert priors.shape == (expected, 4)
    assert priors.min() >= 0.0
    # centers within the unit square, sizes positive
    assert (priors[:, 2:] > 0).all()


def test_decode_identity_loc_recovers_priors():
    priors = prior_boxes((64, 64))
    loc = np.zeros((priors.shape[0], 4), np.float32)
    boxes = decode_boxes(loc, priors)
    # zero offsets -> boxes centered on priors with prior sizes
    np.testing.assert_allclose(
        (boxes[:, :2] + boxes[:, 2:]) / 2, priors[:, :2], atol=1e-6)
    np.testing.assert_allclose(
        boxes[:, 2:] - boxes[:, :2], priors[:, 2:], atol=1e-6)
    ldm = decode_landmarks(np.zeros((priors.shape[0], 10), np.float32), priors)
    np.testing.assert_allclose(ldm[:, 0:2], priors[:, :2], atol=1e-6)


def test_nms_suppresses_overlaps():
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],   # heavy overlap with the first
            [50, 50, 60, 60, 0.7],
        ],
        np.float32,
    )
    keep = nms(dets, 0.4)
    assert keep == [0, 2]


@pytest.mark.heavy
def test_retinaface_output_shapes():
    model = RetinaFace()
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    loc, conf, ldm = model.apply({"params": params}, x)
    a = prior_boxes((128, 128)).shape[0]
    assert loc.shape == (1, a, 4)
    assert conf.shape == (1, a, 2)
    assert ldm.shape == (1, a, 10)
    # conf is a softmax
    np.testing.assert_allclose(np.asarray(conf).sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_detector_end_to_end_random_weights():
    det = RetinaFaceDetector.create(canvas=256)
    img = (np.random.rand(200, 300, 3) * 255).astype(np.uint8)
    out = det.detect_faces(img, conf_threshold=0.3)
    assert out.ndim == 2 and out.shape[1] == 15


def test_parsenet_shapes_and_mask():
    from supir_tpu.models.parsenet import FaceParser

    parser = FaceParser.create(in_size=64, res_depth=2)
    face = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = parser.parse_mask(face)
    assert mask.shape == (64, 64)
    assert mask.min() >= 0.0 and mask.max() <= 1.0
    # borders are zeroed by the reference pipeline
    assert mask[:10].max() == 0.0 and mask[:, :10].max() == 0.0


def _torch_shape(kind, flax_val):
    v = np.asarray(flax_val)
    if kind == "conv":
        return np.transpose(v, (3, 2, 0, 1))
    if kind == "linear":
        return np.transpose(v, (1, 0))
    return v


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


@pytest.mark.parametrize("which", ["retinaface", "parsenet"])
def test_face_converters_cover_model(which):
    """Every converter rule lands on a real leaf of the flax tree, every
    leaf is covered, and shapes round-trip (completeness + shape contract;
    key spellings vs the real facexlib files are checked loudly at load
    time by the ConversionReport)."""
    from supir_tpu.utils import face_ckpt

    if which == "retinaface":
        model = RetinaFace()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        rules = face_ckpt.retinaface_rules()
        convert = face_ckpt.convert_retinaface_state_dict
    else:
        from supir_tpu.models.parsenet import ParseNet

        model = ParseNet(in_size=512, res_depth=10)
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 512, 512, 3)))["params"]
        )
        rules = face_ckpt.parsenet_rules()
        convert = face_ckpt.convert_parsenet_state_dict

    # synthesize a torch state dict shaped by the rules
    sd = {}
    for tkey, fpath, kind in rules:
        leaf = _get_path(params, fpath)
        sd[tkey] = _torch_shape(kind, np.zeros(leaf.shape, np.float32))

    out, report = convert(sd)
    assert not report.missing, report.missing[:5]
    assert not report.unused, report.unused[:5]
    assert report.filled == len(rules)

    # converted tree covers exactly the model's leaves, with right shapes
    flat_model = jax.tree_util.tree_leaves_with_path(params)
    flat_out = dict(jax.tree_util.tree_leaves_with_path(out))
    assert len(flat_model) == len(flat_out)
    for path, leaf in flat_model:
        assert path in flat_out, path
        assert flat_out[path].shape == leaf.shape, (path, flat_out[path].shape, leaf.shape)


def test_detector_wrapper_and_parsed_pasteback():
    """Detector-driven landmarks flow through the helper; parse-mask
    paste-back blends without shape errors (reference flow
    gradio_demo_face.py:100-214)."""
    from supir_tpu.models.parsenet import FaceParser
    from supir_tpu.utils.face_restore import (
        AlignedFace,
        FaceRestoreHelper,
        ParsedPasteBack,
        landmarks_from_detections,
    )

    class FakeDet:
        def detect_faces(self, img, conf_threshold=0.8, nms_threshold=0.4):
            row = np.zeros(15, np.float32)
            row[:5] = [20, 20, 90, 90, 0.99]
            # eyes / nose / mouth in a plausible arrangement
            row[5:15] = [40, 40, 70, 40, 55, 58, 45, 72, 65, 72]
            return row[None]

    from supir_tpu.utils.face_restore import detector_from_models

    det = detector_from_models(FakeDet())
    img = np.random.rand(112, 112, 3).astype(np.float32)
    helper = FaceRestoreHelper(face_size=64, detector=det)
    faces = helper.align_warp_faces(img)
    assert len(faces) == 1
    assert faces[0].crop.shape == (64, 64, 3)

    parser = FaceParser.create(in_size=64, res_depth=1)
    paste = ParsedPasteBack(helper, parser=parser)
    out = paste(img, faces, [faces[0].crop])
    assert out.shape == img.shape
    assert np.isfinite(out).all()


# ---------------------------------------------------------------- manifests

FACE_MANIFEST = __file__.rsplit("/", 2)[0] + "/supir_tpu/data/face_key_manifests.json"


@pytest.fixture(scope="module")
def face_manifests():
    import json

    with open(FACE_MANIFEST) as f:
        return json.load(f)


def _rules_and_model(which):
    from supir_tpu.models.parsenet import ParseNet
    from supir_tpu.utils import face_ckpt

    if which == "retinaface":
        model = RetinaFace()
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        )["params"]
        return face_ckpt.retinaface_rules(), params
    model = ParseNet(in_size=512, res_depth=10)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    )["params"]
    return face_ckpt.parsenet_rules(), params


@pytest.mark.parametrize("which", ["retinaface", "parsenet"])
def test_face_rules_bijective_vs_manifest(which, face_manifests):
    """The converter's torch key space must equal the pinned manifest
    (generated by tools/make_face_manifests.py from torch modules whose
    attribute structure replicates the public facexlib/biubug6 layouts —
    torch derives key names mechanically, so spellings are forced), and the
    torch shapes must map onto the full-width flax leaves. This is the
    SDXL-manifest treatment (test_ckpt_manifest.py) for the face models;
    reference load contract: face_restoration_helper.py:114-118."""
    manifest = face_manifests[which]
    rules, params = _rules_and_model(which)

    rule_keys = {tk for tk, _, _ in rules}
    missing = rule_keys - set(manifest)
    extra = set(manifest) - rule_keys
    assert not missing, sorted(missing)[:5]
    assert not extra, sorted(extra)[:5]
    assert len(rule_keys) == len(rules), "duplicate rule keys"

    for tkey, fpath, kind in rules:
        leaf = _get_path(params, fpath)
        want = list(_torch_shape(kind, np.zeros(leaf.shape, np.float32)).shape)
        assert manifest[tkey] == want, (tkey, manifest[tkey], want)


@pytest.mark.heavy
def test_face_load_smoke_from_synthetic_checkpoints(tmp_path, face_manifests):
    """End-to-end: torch-save synthetic checkpoints shaped by the manifest,
    load through load_retinaface/load_parsenet (strict ConversionReport),
    and run one detect + parse pass."""
    torch = pytest.importorskip("torch")

    from supir_tpu.utils.face_ckpt import load_parsenet, load_retinaface

    paths = {}
    rng = np.random.default_rng(0)
    for which in ("retinaface", "parsenet"):
        sd = {
            k: torch.from_numpy(rng.normal(0, 0.05, shape).astype(np.float32))
            for k, shape in face_manifests[which].items()
        }
        # running_var must stay positive
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = sd[k].abs() + 1.0
        p = tmp_path / f"{which}.pth"
        torch.save(sd, str(p))
        paths[which] = str(p)

    det = load_retinaface(paths["retinaface"], canvas=64)
    faces = det.detect_faces(np.zeros((48, 48, 3), np.uint8))
    assert faces.shape[1] == 15

    parser = load_parsenet(paths["parsenet"])
    mask = parser.parse_mask(np.zeros((512, 512, 3), np.uint8))
    assert mask.shape == (512, 512)
    assert np.isfinite(mask).all()
