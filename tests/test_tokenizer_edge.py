"""Edge-case regressions for the host tokenizers (data/tokenizer.py) —
each pins a real bug found by review:

- GPT-2 real-vocab runs padded with id 0 ('!') instead of eos, breaking
  the classifier's last-real-token pooling (gpt2.py PAD_ID=50256) and
  making decode() drop legitimate '!' tokens.
- the merges.txt loader dropped EVERY line starting with '#', but only
  the first line is a header — GPT-2 has real merges like "# #" -> "##".
- CRLF vocab.txt files missed every entry (incl. [CLS]/[SEP]).
- the OPT hash fallback appended a trailing sep the real-vocab OPT
  tokenizer (bos only) never emits.
"""

import json
import os

import numpy as np

from garbage_classification_rca_tpu.data.tokenizer import (
    ByteLevelBPETokenizer, HashTokenizer, WordPieceTokenizer, get_tokenizer)

BPE_VOCAB = os.path.join(os.path.dirname(__file__), "fixtures", "vocab",
                         "bpe")


def _gpt2_style_vocab(tmp_path):
    """Tiny byte-level vocab with GPT-2's specials and '#' merges."""
    toks = [chr(c) for c in range(ord("!"), ord("~") + 1)]  # '!' is id 0
    toks += ["Ġ", "##", "###", "Ġab", "ab", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(toks)}
    vj = tmp_path / "vocab.json"
    vj.write_text(json.dumps(vocab))
    mt = tmp_path / "merges.txt"
    mt.write_text("#version: 0.2\n# #\n## #\na b\nĠ ab\n")
    return str(tmp_path)


def test_gpt2_real_vocab_pads_with_eos(tmp_path):
    d = _gpt2_style_vocab(tmp_path)
    tok = get_tokenizer("gpt2", d)
    assert isinstance(tok, ByteLevelBPETokenizer)
    vocab = json.load(open(os.path.join(d, "vocab.json")))
    assert tok.pad_id == vocab["<|endoftext|>"]
    # encode adds NO specials (HF GPT-2 contract) ...
    ids, mask = tok.encode_one("ab", max_len=8)
    assert vocab["<|endoftext|>"] not in ids
    # ... and batch padding must use eos, not id 0 ('!')
    enc = tok.encode_batch(["ab"], max_len=6)
    tail = enc.input_ids[0][int(enc.attention_mask[0].sum()):]
    assert (tail == vocab["<|endoftext|>"]).all()
    # '!' (id 0) is a legitimate token — decode must keep it
    assert "!" in tok.decode([vocab["!"]])


def test_merges_header_only_first_line(tmp_path):
    d = _gpt2_style_vocab(tmp_path)
    tok = get_tokenizer("gpt2", d)
    # '# #' and '## #' are real merges: '###' must come back as ONE token
    ids, _ = tok.encode_one("###", max_len=8)
    vocab = json.load(open(os.path.join(d, "vocab.json")))
    assert ids == [vocab["###"]]
    # the '#version' header must still be skipped (not parsed as a merge)
    assert ("#version:", "0.2") not in tok.ranks


def test_wordpiece_vocab_tolerates_crlf(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_bytes(b"[PAD]\r\n[UNK]\r\n[CLS]\r\n[SEP]\r\nhello\r\n")
    tok = WordPieceTokenizer.from_vocab_file(str(p))
    assert (tok.pad_id, tok.cls_id, tok.sep_id) == (0, 2, 3)
    ids, _ = tok.encode_one("hello", max_len=8)
    assert ids == [2, 4, 3]


def test_opt_hash_fallback_matches_real_shape():
    """The real-vocab OPT tokenizer emits bos + tokens with NO trailing
    sep; the hash fallback must produce the same sequence shape so smoke
    runs exercise production-shaped prompts."""
    real = get_tokenizer("opt", BPE_VOCAB)
    hashed = get_tokenizer("opt", None)
    assert isinstance(hashed, HashTokenizer)
    r_ids, _ = real.encode_one("ab cd", max_len=16)
    h_ids, _ = hashed.encode_one("ab cd", max_len=16)
    assert r_ids[0] == h_ids[0] == 2          # bos </s>
    assert h_ids[-1] != 2                     # no trailing sep
    assert r_ids[-1] != 2


def test_manifest_captions_key_uses_class_dir(tmp_path):
    """Captions CSV is keyed class/file.jpg (CustomImageTextFolder.py:
    81-112); images in nested subfolders must still find their caption."""
    from PIL import Image

    from garbage_classification_rca_tpu.data.manifest import build_manifest

    root = tmp_path / "ds"
    for cls in ("black", "blue", "green", "ttr"):
        sub = root / cls / "photos"
        sub.mkdir(parents=True)
        arr = np.zeros((8, 8, 3), np.uint8)
        Image.fromarray(arr).save(sub / f"{cls}_item_1.jpg")
    csv = tmp_path / "caps.csv"
    lines = ["filename,description"]
    for cls in ("black", "blue", "green", "ttr"):
        lines.append(f"{cls}/{cls}_item_1.jpg,a {cls} thing")
    csv.write_text("\n".join(lines) + "\n")
    m = build_manifest(str(root), extended_desc=str(csv))
    for s in m.samples:
        cls = m.classes[s.label]
        assert s.long_text == f"a {cls} thing", s.image_path
