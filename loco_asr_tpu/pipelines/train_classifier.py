"""Train the SLURP intent classifier on cached SpeechT5 embeddings.

CLI parity (speech_text/train_classifier.py:16-23):
  --modality/-m {text,audio}  --pooling/-p {average,max,attention}
  --version/-v {fine_tuned,base}
Reference hyperparameters as defaults: batch 16 (:53), Adam lr=1e-3 +
L2 wd=1e-4 (:68), 100 epochs, early-stop patience 5 on val loss (:61-63),
print_every 200 (:64); train = train + train_synthetic (:33-35).

Artifact parity: checkpoints/{version}/{modality}/{pooling}/ per-epoch +
best + last; results/{version}/{modality}/{pooling}/logs/results.txt with
the reference's line format, plots/losses.png + accuracies.png.

Fixed relative to the reference: the test evaluation actually uses the
test split (the reference evaluates devel twice, train_classifier.py:56 —
BASELINE.md caveat), and pooling is padding-masked (the reference averages
zero-padding into the mean).  ``--parity_pooling`` restores the unmasked
reference behavior for apples-to-apples accuracy comparison.
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Train an Intent Classifier with SpeechT5 embeddings "
                    "from SLURP dataset (TPU)")
    p.add_argument("--modality", "-m", choices=["text", "audio"], required=True)
    p.add_argument("--pooling", "-p", choices=["average", "max", "attention"],
                   required=True)
    p.add_argument("--version", "-v", choices=["fine_tuned", "base"],
                   default="fine_tuned")
    p.add_argument("--folder", default=None,
                   help="embedding root (default extracted/speecht5[_base])")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--print_every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--parity_pooling", action="store_true",
                   help="pool over zero-padding like the reference")
    p.add_argument("--embedding_size", type=int, default=768)
    p.add_argument("--num_classes", type=int, default=101)
    p.add_argument("--hidden_dims", type=int, nargs="*", default=[],
                   help="MLP head hidden sizes (empty = reference linear head)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .common import setup_compilation_cache
    setup_compilation_cache()  # persistent XLA executable cache (docs/BENCH.md)
    import optax

    from ..data.embedding_store import EmbeddingStore
    from ..models import intent
    from ..parallel.train import reference_adam
    from ..utils.checkpoint import Checkpointer, save_npz
    from ..utils.metrics import MetricsWriter

    folder = args.folder or ("extracted/speecht5" if args.version == "fine_tuned"
                             else "extracted/speecht5_base")
    train_set = EmbeddingStore([os.path.join(folder, "train", args.modality),
                                os.path.join(folder, "train_synthetic", args.modality)])
    val_set = EmbeddingStore(os.path.join(folder, "devel", args.modality))
    test_set = EmbeddingStore(os.path.join(folder, "test", args.modality))
    print(f"Train set: {len(train_set)}, Val set: {len(val_set)}, "
          f"Test set: {len(test_set)}")

    save_folder = os.path.join("checkpoints", args.version, args.modality, args.pooling)
    results_folder = os.path.join("results", args.version, args.modality, args.pooling)
    plots_folder = os.path.join(results_folder, "plots")
    logs_folder = os.path.join(results_folder, "logs")
    for d in (save_folder, plots_folder, logs_folder):
        os.makedirs(d, exist_ok=True)

    params = intent.intent_classifier_init(
        jax.random.PRNGKey(args.seed), embedding_size=args.embedding_size,
        num_classes=args.num_classes, hidden_dims=tuple(args.hidden_dims))
    tx = reference_adam(args.lr, args.weight_decay)
    opt_state = tx.init(params)
    method = args.pooling if args.pooling != "attention" else "attention"
    use_lengths = not args.parity_pooling

    @jax.jit
    def train_step(params, opt_state, emb, lengths, targets):
        def loss_fn(p):
            return intent.intent_loss_and_acc(
                p, emb, targets, method=method,
                lengths=lengths if use_lengths else None)
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, correct

    @jax.jit
    def eval_step(params, emb, lengths, targets):
        logits = intent.intent_forward(params, emb, method=method,
                                       lengths=lengths if use_lengths else None)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss_sum = -jnp.sum(targets.astype(jnp.float32) * logp)
        correct = jnp.sum((jnp.argmax(logits, -1) == jnp.argmax(targets, -1)))
        return loss_sum, correct

    def evaluate(params, store):
        loss_sum, correct = 0.0, 0
        for emb, lens, tgts in store.padded_batches(args.batch_size):
            ls, c = eval_step(params, jnp.asarray(emb), jnp.asarray(lens),
                              jnp.asarray(tgts))
            loss_sum += float(ls)
            correct += int(c)
        return loss_sum / len(store), correct / len(store)

    ckpt = Checkpointer(save_folder)
    metrics = MetricsWriter(os.path.join(logs_folder, "metrics.jsonl"))
    text_to_write = "Results\n"
    total_loss, val_loss_list, acc_list, acc_val_list = [], [], [], []
    best_val_loss = float("inf")
    epochs_without_improvement = 0
    n_batches = -(-len(train_set) // args.batch_size)

    print("Training started...")
    for epoch in range(args.epochs):
        epoch_loss, acc_train = 0.0, 0.0
        for i, (emb, lens, tgts) in enumerate(train_set.padded_batches(
                args.batch_size, shuffle=True, seed=args.seed + epoch)):
            params, opt_state, loss, correct = train_step(
                params, opt_state, jnp.asarray(emb), jnp.asarray(lens),
                jnp.asarray(tgts))
            epoch_loss += float(loss)
            acc_train += float(correct)
            if (i + 1) % args.print_every == 0:
                line = (f"Epoch [{epoch+1}/{args.epochs}], "
                        f"Iteration [{i+1}/{n_batches}], Loss: {float(loss):.4f}")
                print(line)
                text_to_write += line + "\n"

        epoch_loss /= n_batches
        acc_train /= len(train_set)
        total_loss.append(epoch_loss)
        acc_list.append(acc_train)
        ckpt.save(epoch + 1, {"params": params, "opt_state": opt_state})
        save_npz(os.path.join(
            save_folder,
            f"speecht5_{args.pooling}_{args.modality}_epoch_{epoch+1}.npz"), params)

        val_loss, acc_val = evaluate(params, val_set)
        val_loss_list.append(val_loss)
        acc_val_list.append(acc_val)
        metrics.log(epoch=epoch + 1, train_loss=epoch_loss, train_acc=acc_train,
                    val_loss=val_loss, val_acc=acc_val)

        line = (f"Epoch [{epoch+1}/{args.epochs}], Training Loss: {epoch_loss:.4f}, "
                f"Training accuracy: {round(acc_train*100, 2)}, "
                f"Validation Loss: {val_loss:.4f}, "
                f"Validation accuracy: {acc_val*100:.2f}")
        print(line)
        text_to_write += f"###### {line} ######\n\n"

        if val_loss < best_val_loss:
            best_val_loss = val_loss
            epochs_without_improvement = 0
            save_npz(os.path.join(
                save_folder, f"speecht5_{args.pooling}_{args.modality}_best.npz"), params)
        else:
            epochs_without_improvement += 1
        if epochs_without_improvement >= args.patience:
            print(f"Early stopping: Validation loss has not improved in the "
                  f"last {args.patience} epochs.")
            break

    save_npz(os.path.join(
        save_folder, f"speecht5_{args.pooling}_{args.modality}_last.npz"), params)
    with open(os.path.join(logs_folder, "results.txt"), "w") as f:
        f.write(text_to_write)

    _plots(plots_folder, total_loss, val_loss_list, acc_list, acc_val_list)
    print("Training done!")

    from ..utils.checkpoint import load_npz
    best = load_npz(os.path.join(
        save_folder, f"speecht5_{args.pooling}_{args.modality}_best.npz"))
    print("Evaluating model on test set")
    test_loss, test_acc = evaluate(best, test_set)
    print(f"Test Loss: {test_loss:.4f}")
    print(f"Test Accuracy: {test_acc*100:.2f}")
    print("Evaluation done!")
    return 0


def _plots(plots_folder, total_loss, val_loss, acc, acc_val) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    plt.figure()
    plt.plot(total_loss, label="Training Loss")
    plt.plot(val_loss, label="Validation Loss")
    plt.xlabel("Epoch"); plt.ylabel("Loss")
    plt.title("Training and Validation Loss"); plt.legend()
    plt.savefig(os.path.join(plots_folder, "losses.png"))
    plt.figure()
    plt.plot(acc, label="Training Accuracy")
    plt.plot(acc_val, label="Validation Accuracy")
    plt.xlabel("Epoch"); plt.ylabel("Accuracy")
    plt.title("Training and Validation Accuracy"); plt.legend()
    plt.savefig(os.path.join(plots_folder, "accuracies.png"))


if __name__ == "__main__":
    sys.exit(main())
