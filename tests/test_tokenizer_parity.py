"""Tokenizer parity vs the HF `tokenizers` Rust library, fully offline:
train tiny vocabularies in-test, then our WordPiece / byte-level BPE must
produce identical ids."""

import pytest

tokenizers = pytest.importorskip("tokenizers")

CORPUS = [
    "water bottle plastic recyclable",
    "banana peel compost green bin",
    "old battery take to recycling location",
    "greasy pizza box black garbage",
    "tin can newspaper blue bin recyclable paper",
    "broken glass jar with metal lid",
]

SAMPLES = ["water bottle", "banana peel", "old battery pack",
           "unknownword xyz", "tin can lid"]


def test_wordpiece_matches_hf_tokenizers(tmp_path):
    from tokenizers import BertWordPieceTokenizer

    hf = BertWordPieceTokenizer(lowercase=True)
    hf.train_from_iterator(CORPUS, vocab_size=200, min_frequency=1,
                           special_tokens=["[PAD]", "[UNK]", "[CLS]",
                                           "[SEP]", "[MASK]"])
    hf.save_model(str(tmp_path))

    from garbage_classification_rca_tpu.data.tokenizer import WordPieceTokenizer
    ours = WordPieceTokenizer.from_vocab_file(str(tmp_path / "vocab.txt"))

    cls_id = ours.cls_id
    sep_id = ours.sep_id
    for text in SAMPLES:
        # the freshly-trained HF tokenizer has no [CLS]/[SEP] post-processor;
        # production BERT tokenizers do, and so do we — compare the body
        want = hf.encode(text).ids
        got, mask = ours.encode_one(text, 64)
        assert got == [cls_id] + want + [sep_id], (text, got, want)
        assert mask == [1] * len(got)


def test_byte_bpe_matches_hf_tokenizers(tmp_path):
    from tokenizers import ByteLevelBPETokenizer

    hf = ByteLevelBPETokenizer()
    hf.train_from_iterator(CORPUS, vocab_size=300, min_frequency=1)
    hf.save_model(str(tmp_path))

    from garbage_classification_rca_tpu.data.tokenizer import ByteLevelBPETokenizer as Ours
    ours = Ours.from_files(str(tmp_path / "vocab.json"),
                           str(tmp_path / "merges.txt"))

    for text in SAMPLES:
        want = hf.encode(text).ids
        got, _ = ours.encode_one(text, 64)
        assert got == want, (text, got, want)
