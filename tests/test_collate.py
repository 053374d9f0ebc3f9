import numpy as np

from walkgpt_tpu.data.collate import collate_batch
from walkgpt_tpu.data.conversation import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                           conv_templates,
                                           set_default_conversation)
from walkgpt_tpu.data.pave import PAVESample
from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens


def make_sample(questions, answer, inference=False):
    convs = []
    for q in questions:
        conv = conv_templates["llava_v1"].copy()
        conv.messages = []
        conv.append_message(conv.roles[0], f"<image>\n{q}")
        conv.append_message(conv.roles[1], answer)
        convs.append(conv.get_prompt())
    return PAVESample(
        image_path="/x.png",
        image=np.zeros((64, 64, 3), np.float32),
        image_clip=np.zeros((28, 28, 3), np.float32),
        conversations=convs,
        masks=np.zeros((2, 48, 64), np.float32),
        label=np.zeros((48, 64), np.int32),
        resize=(48, 64), clip_resize=(21, 28),
        questions=(questions, [1, 1], [["a"], ["b"]], "cues"),
        sampled_classes=[["3"], ["15"]],
        inference=inference,
    )


def setup_module(module):
    set_default_conversation("llava_v1")


def test_collate_offsets_and_shapes():
    tok = ByteTokenizer(model_max_length=4096)
    setup_walkgpt_tokens(tok)
    s1 = make_sample(["q1", "q2"], "[assessment] a [/assessment]")
    s2 = make_sample(["q3"], "[assessment] b [/assessment]")
    batch = collate_batch([s1, s2], tok)
    assert batch["offset"].tolist() == [0, 2, 3]
    assert batch["input_ids"].shape[0] == 3
    assert batch["images"].shape == (2, 64, 64, 3)
    # every row has exactly one image sentinel, wrapped by im_start/end
    for row in batch["input_ids"]:
        assert (row == IMAGE_TOKEN_INDEX).sum() == 1


def test_collate_label_masking():
    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    answer = "[assessment] ok [/assessment] Accessible features are here: [p] sidewalk [/p][SEG]"
    s = make_sample(["what?"], answer)
    batch = collate_batch([s], tok)
    ids, labels = batch["input_ids"][0], batch["labels"][0]
    # [SEG] inside the answer must remain supervised
    seg_positions = np.where(ids == st.seg_token_idx)[0]
    assert len(seg_positions) == 1
    assert labels[seg_positions[0]] == st.seg_token_idx
    # BOS masked; system prompt masked
    assert labels[0] == IGNORE_INDEX
    assert labels[1] == IGNORE_INDEX
    # the final </s> is supervised (end of assistant turn)
    eos_pos = np.where(ids == tok.eos_token_id)[0]
    assert len(eos_pos) == 1 and labels[eos_pos[0]] == tok.eos_token_id
    # attention mask matches non-pad
    assert (batch["attention_masks"][0] == (ids != tok.pad_token_id)).all()


def test_collate_train_truncation():
    tok = ByteTokenizer(model_max_length=300)
    setup_walkgpt_tokens(tok)
    s = make_sample(["q" * 500], "a")
    batch = collate_batch([s], tok)
    assert batch["input_ids"].shape[1] == 300 - 255


def test_collate_inference_no_truncation():
    tok = ByteTokenizer(model_max_length=300)
    setup_walkgpt_tokens(tok)
    s = make_sample(["q" * 500], "a", inference=True)
    batch = collate_batch([s], tok)
    assert batch["input_ids"].shape[1] > 45


def make_sample_conv(conv_name, questions, answer, inference=False):
    convs = []
    for q in questions:
        conv = conv_templates[conv_name].copy()
        conv.messages = []
        conv.append_message(conv.roles[0], f"<image>\n{q}")
        conv.append_message(conv.roles[1], answer)
        convs.append(conv.get_prompt())
    return PAVESample(
        image_path="/x.png",
        image=np.zeros((64, 64, 3), np.float32),
        image_clip=np.zeros((28, 28, 3), np.float32),
        conversations=convs,
        masks=np.zeros((1, 48, 64), np.float32),
        label=np.zeros((48, 64), np.int32),
        resize=(48, 64), clip_resize=(21, 28),
        questions=(questions, [1], [["a"]], "cues"),
        sampled_classes=[["3"]],
        inference=inference,
    )


def test_collate_v1_stage1_masking():
    """LLaVA stage-1 preprocess_v1 variant (train/train.py): conv 'v1'
    (vicuna system prompt, TWO separators) masks everything up to and
    including ' ASSISTANT: ' and supervises the answer."""
    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    answer = "a short caption [SEG]"
    s = make_sample_conv("v1", ["describe"], answer)
    batch = collate_batch([s], tok, conv_type="v1")
    ids, labels = batch["input_ids"][0], batch["labels"][0]
    seg_positions = np.where(ids == st.seg_token_idx)[0]
    assert len(seg_positions) == 1
    assert labels[seg_positions[0]] == st.seg_token_idx
    assert labels[0] == IGNORE_INDEX and labels[1] == IGNORE_INDEX
    # supervised region is exactly the assistant answer (+ eos)
    sup = labels != IGNORE_INDEX
    n_sup = int(sup.sum())
    ans_ids = tok.encode(answer)
    assert n_sup >= len([t for t in ans_ids])


def test_collate_mpt_chatml_masking():
    """LLaVA stage-1 preprocess_mpt/chatml variant: ###-separated chatml
    rounds; the first (instruction) chunk is masked (reference
    dataset.py:124-133 effective behavior)."""
    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    answer = "caption [SEG]"
    s = make_sample_conv("chatml", ["describe"], answer)
    batch = collate_batch([s], tok, conv_type="chatml")
    ids, labels = batch["input_ids"][0], batch["labels"][0]
    seg_positions = np.where(ids == st.seg_token_idx)[0]
    assert len(seg_positions) == 1
    assert labels[seg_positions[0]] == st.seg_token_idx
    assert labels[0] == IGNORE_INDEX
    # some prompt region masked, answer supervised
    assert (labels == IGNORE_INDEX).sum() > 2
    assert (labels != IGNORE_INDEX).sum() >= 3
