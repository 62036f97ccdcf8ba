"""From-scratch WordPiece parity vs transformers' pure-Python BertTokenizer.

The referee (transformers.BertTokenizer, the slow non-Rust implementation) is
constructible offline from a local vocab file, so this pins the full BERT
tokenization algorithm — cleanup, CJK spacing, lowercasing + accent stripping,
punctuation splitting, greedy longest-match WordPiece — token-for-token and
id-for-id without any network access. This closes the round-1 gap "WordPiece
parity is untested anywhere" (reference consumes HF tokenizers,
/root/reference/capreolus/tokenizer/bert.py:17-30).
"""

import random

import pytest

from capreolus_tpu.tokenizer.wordpiece import WordPieceTokenizer, basic_tokenize

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "##es", "run", "##ning", "##ing", "un",
    "##affable", "##able", "##afla", "hello", "world", "##ld", "wor",
    "a", "b", "c", "##a", "##b", "##c", "ab", "##ab",
    ",", ".", "!", "?", "-", "'", '"', "(", ")", "$", "#",
    "1", "2", "3", "##1", "##2", "12", "##12",
    "over", "##flow", "deep", "##er", "learn", "##ed",
    "中", "文",  # CJK chars in vocab
    "cafe", "naive", "zurich",  # accent-stripped forms
]

CORPUS = [
    "The quick brown Foxes running, unaffable hello!",
    "hello world",
    "helloworld",
    "deep learning runs deeper than learned overflow",
    "ab abc a b c",
    "ab##c",
    "123 12 1-2 $12",
    "CAFÉ naïve Zürich",  # café naïve Zürich -> accent stripping
    "中文 mixed with english",
    "punct:(nested)? \"quotes\" 'single' -- dashes",
    "",
    "   ",
    "\t\nwhitespace everywhere here",
    "word" * 30,  # 120 chars: exceeds the 100-char wordpiece limit -> UNK
    "unaffable unafla unknownword",
    "\x00control\x01chars\ufffdhere",
    "ThE QuIcK bRoWn",
    "a.b,c!d?e",
    "trailing space ",
    "12quick34",
    "the [CLS] quick",                  # never_split: specials pass through
    "x[SEP]y [MASK], [UNK]!",           # specials split out mid-word (HF tokens_trie)
    "[cls] [PAD][PAD]",                 # lowercase '[cls]' is NOT special
]


@pytest.fixture(scope="module")
def referee(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return transformers.BertTokenizer(str(path), do_lower_case=True), str(path)


def test_tokenize_parity_corpus(referee):
    hf, vocab_path = referee
    ours = WordPieceTokenizer(vocab_path)
    for text in CORPUS:
        assert ours.tokenize(text) == hf.tokenize(text), f"mismatch on {text!r}"


def test_ids_parity(referee):
    hf, vocab_path = referee
    ours = WordPieceTokenizer(vocab_path)
    for text in CORPUS:
        toks = ours.tokenize(text)
        assert ours.convert_tokens_to_ids(toks) == hf.convert_tokens_to_ids(hf.tokenize(text))


def test_random_fuzz_parity(referee):
    """Random strings over a mixed alphabet: any divergence from HF fails."""
    hf, vocab_path = referee
    ours = WordPieceTokenizer(vocab_path)
    alphabet = "abc 12,.!éü中-'\"QW\t"
    specials = ["[CLS]", "[SEP]", "[MASK]"]
    rng = random.Random(1234)
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        if rng.random() < 0.3:  # splice a special token at a random position
            i = rng.randrange(0, len(text) + 1)
            text = text[:i] + rng.choice(specials) + text[i:]
        assert ours.tokenize(text) == hf.tokenize(text), f"mismatch on {text!r}"


def test_special_tokens_and_interface(referee):
    _, vocab_path = referee
    ours = WordPieceTokenizer(vocab_path)
    assert ours.cls_token_id == VOCAB.index("[CLS]")
    assert ours.sep_token_id == VOCAB.index("[SEP]")
    assert ours.pad_token_id == VOCAB.index("[PAD]")
    assert ours.convert_ids_to_tokens([ours.unk_token_id]) == ["[UNK]"]
    with pytest.raises(ValueError):
        WordPieceTokenizer({"no": 0, "specials": 1})


def test_basic_tokenize_units():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("中文ab") == ["中", "文", "ab"]
    assert basic_tokenize("CAFÉ") == ["cafe"]
    assert basic_tokenize("don't") == ["don", "'", "t"]


def test_module_uses_wordpiece_with_vocabfile(referee, tmpdir_as_cache):
    """berttokenizer falls back to the from-scratch WordPiece when vocabfile is set."""
    _, vocab_path = referee
    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.tokenizer import Tokenizer

    tok = Tokenizer.create("berttokenizer",
                           {"pretrained": "definitely-not-a-real-model-xyz", "vocabfile": vocab_path})
    assert tok.tokenize("the quick foxes") == ["the", "quick", "fox", "##es"]
    assert tok.cls_id == VOCAB.index("[CLS]")
