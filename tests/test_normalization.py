"""Golden tests for answer normalization / EM (reference
``normalization.py:8-64`` semantics)."""

from sdag_tpu.eval.normalization import (
    exact_match, extract_final_answer, normalize_answer)


def test_normalize_lower_punct_articles_whitespace():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("An apple a day") == "apple day"
    assert normalize_answer("") == ""


def test_normalize_unicode_nfd():
    # NFD decomposition: accent becomes a combining char (not punctuation).
    out = normalize_answer("Café")
    assert out.startswith("cafe")


def test_normalize_article_inside_word_kept():
    # 'a'/'an'/'the' removed only at word boundaries.
    assert normalize_answer("theatre") == "theatre"
    assert normalize_answer("banana") == "banana"


def test_exact_match_is_substring_of_normalized():
    assert exact_match("The answer is Paris, France.", "paris")
    assert exact_match("PARIS", "Paris")
    assert not exact_match("London", "Paris")
    # <think> blocks stripped from prediction before matching
    assert not exact_match("<think>Paris</think>London", "Paris")
    assert exact_match("<think>x</think>Paris", "Paris")


def test_exact_match_none_safe():
    assert not exact_match(None, "x")
    assert exact_match("anything", "")  # empty GT normalizes to "" substring


def test_extract_final_answer():
    assert extract_final_answer("Answer: Paris\nmore text") == "Paris"
    assert extract_final_answer("- Final Answer:  42") == "42"
    assert extract_final_answer("<think>blah\nblah</think>\n\nRome") == "Rome"
    assert extract_final_answer("") == ""
    assert extract_final_answer(None) == ""
    assert extract_final_answer("\n\n  first\nsecond") == "first"
