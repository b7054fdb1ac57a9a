"""Generate committed tokenizer-vocabulary fixtures (VERDICT r1 item 8).

Real HF pretrained vocabs are not redistributable-by-download in this
offline image, so we synthesize REAL vocab files with the HF `tokenizers`
Rust library (the exact library the reference's tokenizers wrap,
CustomImageTextFolder.py:301-336): a BERT-style WordPiece `vocab.txt` and
a GPT-2-style byte-level BPE `vocab.json` + `merges.txt`, trained on a
garbage-classification-domain corpus. The files exercise every parsing +
special-token code path our tokenizers use with true pretrained files.

Run: python tools/make_vocab_fixtures.py   (rewrites tests/fixtures/vocab)
"""

import os

CORPUS = [
    "water bottle plastic recyclable blue bin",
    "banana peel compost green bin organics",
    "old battery take to recycling location hazardous",
    "greasy pizza box black garbage landfill",
    "tin can newspaper blue bin recyclable paper cardboard",
    "broken glass jar with metal lid household",
    "styrofoam plate coffee cup lid black cart",
    "yard waste leaves grass clippings green cart",
    "paint can electronics old phone drop off depot",
    "milk jug detergent bottle shampoo container plastic",
    "apple core egg shells food scraps compostable",
    "aluminum foil pie plate clean recyclable",
    "plastic bag film wrap not accepted curbside",
    "light bulb fluorescent tube special handling",
    "clothing textiles donation not garbage",
    "what goes where in calgary black blue green ttr",
]


def main(out_root="tests/fixtures/vocab"):
    from tokenizers import BertWordPieceTokenizer, ByteLevelBPETokenizer

    wp_dir = os.path.join(out_root, "wordpiece")
    bpe_dir = os.path.join(out_root, "bpe")
    os.makedirs(wp_dir, exist_ok=True)
    os.makedirs(bpe_dir, exist_ok=True)

    wp = BertWordPieceTokenizer(lowercase=True)
    wp.train_from_iterator(CORPUS, vocab_size=400, min_frequency=1,
                           special_tokens=["[PAD]", "[UNK]", "[CLS]",
                                           "[SEP]", "[MASK]"])
    wp.save_model(wp_dir)

    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(
        CORPUS, vocab_size=500, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    bpe.save_model(bpe_dir)
    print(f"wrote {wp_dir}/vocab.txt, {bpe_dir}/vocab.json+merges.txt")


if __name__ == "__main__":
    main()
