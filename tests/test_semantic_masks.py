"""Semantic mask stack: OneFormer-style inference math + movable-class
union (reference compute_mask.py:70-127,363-381,726-761)."""

import numpy as np
import pytest

from pgdvs_tpu.preprocess.semantic_masks import (
    DYNAMIC_IDS_ADE20K,
    DYNAMIC_IDS_COCO,
    SEM_SEG_PROB_THRES,
    semantic_dynamic_union,
    semantic_map_from_scores,
    semantic_scores_from_queries,
)


def test_scores_from_queries_manual():
    """Hand-computed 2-query, 2-class, 1-pixel aggregation."""
    # query 0: strongly class 0; query 1: strongly null (dropped)
    cls = np.array([[4.0, 0.0, 0.0], [0.0, 0.0, 6.0]], np.float32)
    msk = np.array([[[2.0]], [[2.0]]], np.float32)  # both cover the pixel
    scores = semantic_scores_from_queries(cls, msk)
    assert scores.shape == (2, 1, 1)

    def softmax(x):
        e = np.exp(x - x.max())
        return e / e.sum()

    sig = 1.0 / (1.0 + np.exp(-2.0))
    p0, p1 = softmax(cls[0]), softmax(cls[1])
    want0 = p0[0] * sig + p1[0] * sig
    want1 = p0[1] * sig + p1[1] * sig
    np.testing.assert_allclose(scores[:, 0, 0], [want0, want1], rtol=1e-5)


def test_map_thresholds_low_confidence_to_minus_one():
    scores = np.zeros((3, 2, 2), np.float32)
    scores[1, 0, 0] = 0.5            # confident class 1
    scores[2, 0, 1] = 0.09           # below 0.1 -> -1
    scores[0, 1, 0] = 0.1            # exactly at threshold: kept (< is strict)
    seg = semantic_map_from_scores(scores, prob_thres=SEM_SEG_PROB_THRES)
    assert seg[0, 0] == 1
    assert seg[0, 1] == -1
    assert seg[1, 0] == 0
    assert seg[1, 1] == -1           # all-zero scores -> low confidence


def test_dynamic_union_one_indexing():
    """IDs are 1-indexed in the lists; seg maps 0-indexed; -1 never hits."""
    ade = np.full((2, 3), -1, np.int64)
    coco = np.full((2, 3), -1, np.int64)
    ade[0, 0] = DYNAMIC_IDS_ADE20K[0] - 1   # person (13 -> 12)
    ade[0, 1] = DYNAMIC_IDS_ADE20K[0]       # NOT movable (off by one)
    coco[1, 2] = DYNAMIC_IDS_COCO[0] - 1    # person (1 -> 0)
    union = semantic_dynamic_union(ade, coco)
    want = np.zeros((2, 3), bool)
    want[0, 0] = True
    want[1, 2] = True
    np.testing.assert_array_equal(union, want)


def test_reference_id_lists_verbatim():
    """The movable-class lists must match the reference constants."""
    assert DYNAMIC_IDS_ADE20K[:3] == [13, 21, 77]
    assert DYNAMIC_IDS_ADE20K[-1] == 150 and len(DYNAMIC_IDS_ADE20K) == 18
    assert DYNAMIC_IDS_COCO[:3] == [1, 2, 3]
    assert DYNAMIC_IDS_COCO[-1] == 39 and len(DYNAMIC_IDS_COCO) == 25


@pytest.mark.slow
def test_tiny_oneformer_end_to_end_random_weights():
    """The transformers OneFormer wiring produces a valid seg map with a
    random tiny model (no checkpoints needed): model outputs -> query
    aggregation -> upsample -> argmax/threshold."""
    import torch
    import torch.nn.functional as F
    from transformers import (
        OneFormerConfig,
        OneFormerForUniversalSegmentation,
        SwinConfig,
    )

    torch.manual_seed(0)
    bb = SwinConfig(
        image_size=64, patch_size=4, embed_dim=32, depths=[1, 1, 1, 1],
        num_heads=[1, 1, 1, 1],
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = OneFormerConfig(
        backbone_config=bb, hidden_dim=32, num_queries=8, encoder_layers=1,
        decoder_layers=2, num_labels=10, text_encoder_vocab_size=30,
        text_encoder_width=32, text_encoder_num_layers=1, conv_dim=32,
        mask_dim=32, dim_feedforward=64, task_seq_len=7, max_seq_len=7,
        text_encoder_n_ctx=4, encoder_feedforward_dim=64,
    )
    model = OneFormerForUniversalSegmentation(cfg).eval()
    with torch.no_grad():
        out = model(
            pixel_values=torch.randn(1, 3, 64, 64),
            task_inputs=torch.randint(0, 30, (1, 7)),
        )
    scores = semantic_scores_from_queries(
        out.class_queries_logits[0].numpy(),
        out.masks_queries_logits[0].numpy(),
    )
    assert scores.shape[0] == 10  # null class dropped
    scores_up = F.interpolate(
        torch.from_numpy(scores)[None], size=(64, 64), mode="bilinear",
        align_corners=False,
    )[0].numpy()
    seg = semantic_map_from_scores(scores_up)
    assert seg.shape == (64, 64)
    assert seg.max() < 10 and seg.min() >= -1
    # unions over a random map are well-formed
    union = semantic_dynamic_union(seg, np.full_like(seg, -1))
    assert union.dtype == bool and union.shape == seg.shape
