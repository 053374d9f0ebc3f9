from walkgpt_tpu.data.conversation import (SeparatorStyle, conv_templates,
                                           set_default_conversation,
                                           get_default_conversation)


def test_llava_v1_prompt_format():
    conv = conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "<image>\nWhat is here?")
    conv.append_message(conv.roles[1], "[assessment] ok [/assessment]")
    prompt = conv.get_prompt()
    assert prompt.startswith("You are WalkGPT, an accessibility analyst.")
    assert " USER: <image>\nWhat is here? ASSISTANT: [assessment] ok [/assessment]</s>" \
        in prompt
    # system + sep(" ") joins directly
    assert conv.sep == " " and conv.sep2 == "</s>"


def test_llava_v1_generation_prompt_ends_with_role():
    conv = conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "Q")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt().endswith("USER: Q ASSISTANT:")


def test_two_style_alternating_separators():
    conv = conv_templates["v1"].copy()
    conv.messages = []
    conv.append_message("USER", "a")
    conv.append_message("ASSISTANT", "b")
    conv.append_message("USER", "c")
    conv.append_message("ASSISTANT", "d")
    p = conv.get_prompt()
    assert p.endswith("USER: a ASSISTANT: b</s>USER: c ASSISTANT: d</s>")


def test_single_style():
    conv = conv_templates["llava_v0"].copy()
    conv.append_message("Human", "hello")
    conv.append_message("Assistant", None)
    p = conv.get_prompt()
    assert p.endswith("###Human: hello###Assistant:")


def test_mpt_style():
    conv = conv_templates["mpt"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.endswith("<|im_start|>user\nhi<|im_end|><|im_start|>assistant\n")


def test_llama2_style():
    conv = conv_templates["llava_llama_2"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "question")
    conv.append_message(conv.roles[1], "answer")
    p = conv.get_prompt()
    assert p.startswith("[INST] <<SYS>>\n")
    assert p.endswith("[/INST] answer </s>")


def test_plain_style():
    conv = conv_templates["plain"].copy()
    conv.sep2 = "\n"
    conv.messages = []
    conv.append_message("", "<image>caption")
    conv.append_message("", "a cat")
    assert conv.get_prompt() == "<image>caption\na cat\n"


def test_default_conversation_override():
    set_default_conversation("llava_v1")
    assert get_default_conversation().version == "walkgpt_v1"
    set_default_conversation("v0")
    assert get_default_conversation().sep_style == SeparatorStyle.SINGLE


def test_copy_is_deep():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message("USER", "x")
    assert conv_templates["llava_v1"].messages == []


def test_tuple_message_and_mmtag_paths():
    """Gradio tuple-message preamble (conversation.py:31-45): mmtag versions
    wrap the image in <Image></Image> with an ack turn; others prepend
    '<image>\\n'."""
    from walkgpt_tpu.data.conversation import conv_templates

    conv = conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], ("what is here? <image>", None, "Crop"))
    conv.append_message(conv.roles[1], "an answer")
    out = conv.get_prompt()
    assert "<image>\nwhat is here?" in out
    assert "<Image>" not in out

    mm = conv_templates["v1_mmtag"].copy()
    mm.messages = []
    mm.append_message(mm.roles[0], ("what is here? <image>", None, "Crop"))
    mm.append_message(mm.roles[1], "an answer")
    out = mm.get_prompt()
    assert "<Image><image></Image>" in out
    assert "Received." in out
    assert "what is here?" in out
