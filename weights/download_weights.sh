#!/bin/bash
# Fetch the published FRTM checkpoints (the torch .pth refiner weights released
# with the CVPR 2020 paper; file ids from the reference release) plus the
# torchvision backbone weights our converter consumes.
# The .pth files load directly via evaluate.py --model (conversion happens
# in-process; see frtm_tpu/utils/checkpoints.py).
set -e
cd "$(dirname "$0")"

gdrive_fetch() {
    local id="$1" out="$2"
    echo "Fetching $out ..."
    # Google Drive two-step download (large-file confirm token)
    local url="https://drive.google.com/uc?export=download&id=${id}"
    local conf
    conf=$(curl -sc /tmp/gd_cookie "$url" | sed -n 's/.*confirm=\([0-9A-Za-z_]*\).*/\1/p' | head -1)
    curl -Lb /tmp/gd_cookie "${url}&confirm=${conf:-t}" -o "$out"
}

# Published FRTM refiner checkpoints
gdrive_fetch 1anOEzUMxXR4ff2qaUJNojAABWuAmaGvw rn18_all.pth
gdrive_fetch 1t21DG1ts-2NQXDVvuQjW9LY9VVkYuXU5 rn18_ytvos.pth
gdrive_fetch 1KFg7ZjdJyhLE58WzEBlznOrDpKmQqviC rn101_all.pth
gdrive_fetch 1GqaB80sznVkonprCdYhURwGwqiPRhP-v rn101_dv.pth
gdrive_fetch 1gRFn2NojH47BjURSws2XIyuTjzFkmuSV rn101_ytvos.pth

# Frozen torchvision backbones (not part of the FRTM checkpoints)
curl -L https://download.pytorch.org/models/resnet18-f37072fd.pth -o resnet18.pth
curl -L https://download.pytorch.org/models/resnet101-63fe2227.pth -o resnet101.pth

echo "done."
