"""Dataset registry: label sets and canvas sizes.

Parity: reference `src/trainer/trainer/datasets/rico.py:18-68` (label lists)
and `datasets/publaynet.py:13-19`. These are public dataset metadata.
"""

RICO5_LABELS = (
    "Text",
    "Text Button",
    "Toolbar",
    "Image",
    "Icon",
)

RICO13_LABELS = (
    "Toolbar",
    "Image",
    "Text",
    "Icon",
    "Text Button",
    "Input",
    "List Item",
    "Advertisement",
    "Pager Indicator",
    "Web View",
    "Background Image",
    "Drawer",
    "Modal",
)

RICO25_LABELS = (
    "Text",
    "Image",
    "Icon",
    "Text Button",
    "List Item",
    "Input",
    "Background Image",
    "Card",
    "Web View",
    "Radio Button",
    "Drawer",
    "Checkbox",
    "Advertisement",
    "Modal",
    "Pager Indicator",
    "Slider",
    "On/Off Switch",
    "Button Bar",
    "Toolbar",
    "Number Stepper",
    "Multi-Tab",
    "Date Picker",
    "Map View",
    "Video",
    "Bottom Navigation",
)

PUBLAYNET_LABELS = (
    "text",
    "title",
    "list",
    "table",
    "figure",
)

DATASET_LABELS = {
    "rico5": RICO5_LABELS,
    "rico13": RICO13_LABELS,
    "rico25": RICO25_LABELS,
    "publaynet": PUBLAYNET_LABELS,
}

# canvas aspect ratio (W, H) used for visualization, matching the reference
# renderer defaults (`helpers/visualization.py:66-115` uses H/W from dataset).
DATASET_CANVAS = {
    "rico5": (360, 640),
    "rico13": (360, 640),
    "rico25": (360, 640),
    "publaynet": (612, 792),
}
