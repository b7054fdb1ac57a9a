"""``python -m garbage_classification_rca_tpu`` — list the CLI entry points."""

COMMANDS = {
    "cli.main_image": "train an image classifier (reference main_image.py)",
    "cli.main_text": "train a text classifier (reference main_text.py)",
    "cli.main_both": "train a multimodal fusion model (reference main_both.py)",
    "cli.test_image": "evaluate an image checkpoint (calculate_test_accuracy_image.py)",
    "cli.test_text": "evaluate a text checkpoint (calculate_test_accuracy_text.py)",
    "cli.test_both": "evaluate a fusion checkpoint (calculate_test_accuracy_both.py)",
    "cli.blip2_train": "BLIP-2 LoRA fine-tuning (blip_2_training.py)",
    "cli.blip2_test": "BLIP-2 test-set eval (blip_2_test_set.py)",
    "cli.qformer_train": "Q-Former classifier training (q_former_training.py)",
    "cli.qformer_test": "Q-Former classifier eval (q_former_test_set.py)",
    "cli.split_dataset": "stratified 80/10/10 split (split_dataset.py)",
    "cli.calculate_mean_std": "dataset channel stats (calculate_mean_std_dataset.py)",
    "cli.llama_caption": "caption-CSV generator (llama_caption.py)",
    "cli.chat_gpt_baseline": "LLM filename-classification baseline (chat_GPT_results.py)",
}

if __name__ == "__main__":
    print("garbage_classification_rca_tpu — TPU-native rebuild of "
          "Garbage_Classification_RCA\n")
    print("usage: python -m garbage_classification_rca_tpu.<command> --help\n")
    for mod, desc in COMMANDS.items():
        print(f"  {mod:28s} {desc}")
