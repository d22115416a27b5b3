"""Built-in hex model families and training utilities."""
from .hexcnn import (HexCNN, HexConvNeXtBlock, HexResBlock, HexResNet,
                     hexcnn_small, hexcnn_tiny)
from .hexunet import HexUNet, HexConvTranspose2d, HexPixelShuffleUpsample
from .hexvit import HexViT, hexvit_tiny
from .video import (make_frame_processor, make_batch_processor,
                    process_stream, StreamStats)
from .fit import fit
from .train import (
    TrainState,
    create_train_state,
    train_step,
    eval_step,
    dense_onehot_xent,
    hexify_batch,
    synthetic_hex_cifar,
    synthetic_hex_shapes,
    mean_iou,
)

__all__ = [
    "HexCNN",
    "HexUNet",
    "HexViT",
    "hexvit_tiny",
    "HexConvTranspose2d",
    "HexPixelShuffleUpsample",
    "make_frame_processor",
    "make_batch_processor",
    "process_stream",
    "StreamStats",
    "HexConvNeXtBlock",
    "HexResBlock",
    "HexResNet",
    "hexcnn_small",
    "hexcnn_tiny",
    "fit",
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "dense_onehot_xent",
    "hexify_batch",
    "synthetic_hex_cifar",
    "synthetic_hex_shapes",
    "mean_iou",
]
