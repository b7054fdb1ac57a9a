"""BLIP-2 prompt/label plumbing (blip_2_training.py:47-134 parity)."""

from garbage_classification_rca_tpu.models.vlm.prompts import (
    ANSWER_WORDS, FOLDER_TO_ANSWER, build_prompt, find_closest_string,
    prompt_text_from_path)


def test_prompt_text_from_path():
    # digits stripped, extension dropped, underscores to spaces
    assert prompt_text_from_path("/d/blue/water_bottle_12.jpg") == "water bottle"
    assert prompt_text_from_path("x/ttr/old_phone_11.png") == "old phone"


def test_build_prompt_contains_knowledge_and_answer_cue():
    p = build_prompt("water bottle")
    assert "Blue label is recyclable" in p
    assert "which label does this water bottle belong to? Answer:" in p


def test_folder_to_answer_ttr_is_yellow():
    assert FOLDER_TO_ANSWER["ttr"] == "Yellow"
    assert FOLDER_TO_ANSWER["TTR"] == "Yellow"


def test_find_closest_string_prefix_shortcuts():
    assert find_closest_string("Yel") == "Yellow"
    assert find_closest_string("Blu") == "Blue"
    assert find_closest_string("Gre") == "Green"
    assert find_closest_string("Bla") == "Black"


def test_find_closest_string_answer_extraction_and_difflib():
    assert find_closest_string("... Answer: Yellow") == "Yellow"
    assert find_closest_string("Blu e") in ANSWER_WORDS
    assert find_closest_string("greenish") == "Green"
    # no match at all -> first entry (reference fallback)
    assert find_closest_string("zzzzqqq") == "Blue"
