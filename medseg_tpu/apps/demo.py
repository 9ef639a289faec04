"""Gradio web demo (behavioral twin of demo/app.py).

Same UI surface: classification/segmentation model dropdowns (defaults
ResNet18 / ResNetUnet), overlay-opacity slider, upload + Analyze/Clear
buttons, confidence CSS classes at the >90 / >70 thresholds, COVID-only
overlay visibility (app.py:138-162), and the full design.css stylesheet.
The event handlers are built by `make_handlers` against an injectable
gradio module so the wiring is unit-testable without gradio installed.
"""

from __future__ import annotations

from pathlib import Path

from medseg_tpu.core.config import EvalConfig

# Selector-for-selector port of reference demo/design.css:1-101.
CSS = (Path(__file__).with_name("design.css")).read_text()

CLS_CHOICES = ["ResNet18", "ResNet50", "VGG16", "VGG19", "CLIP"]
SEG_CHOICES = ["ResNetUnet", "AttentionUNet", "R2Unet", "R2AttUnet", "CLIPSeg"]


def make_handlers(processor, gr):
    """(handle, clear_all) event callbacks over an injectable `gr` module
    (anything exposing gr.update).  Mirrors reference demo/app.py:138-162:
    confidence classes at >90 / >70, overlay visible only for COVID."""

    def handle(image, cls_name, seg_name, op):
        processor._load_models(cls_name, seg_name)
        pred, conf, overlay, text = processor.process_image(image, seg_name,
                                                            overlay_opacity=op)
        conf_class = ("confidence-high" if conf > 90 else
                      "confidence-medium" if conf > 70 else "confidence-low")
        is_covid = pred == "COVID" and overlay is not None
        return (pred,
                gr.update(value=f"Confidence: {conf:.2f}%",
                          elem_classes=[conf_class]),
                gr.update(value=overlay, visible=is_covid),
                gr.update(value=text, visible=True))

    def clear_all():
        return (None, None, gr.update(value=None, visible=False),
                gr.update(value="", visible=False))

    return handle, clear_all


def create_interface(cfg: EvalConfig = EvalConfig()):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; "
            "`pip install gradio` to run the demo") from e

    from medseg_tpu.infer.pipeline import Pipeline

    processor = Pipeline(cfg)

    with gr.Blocks(css=CSS, theme=gr.themes.Soft(primary_hue="teal",
                                                 secondary_hue="blue")) as ui:
        with gr.Column(variant="compact"):
            gr.Markdown("# Lungs Radiography Analysis", elem_classes="heading")
            gr.Markdown("Upload/ Drop a chest X-ray image for COVID-19 "
                        "diagnosis and analysis.")
        with gr.Row(equal_height=True):
            with gr.Column(scale=1):
                cls_dd = gr.Dropdown(choices=CLS_CHOICES, value="ResNet18",
                                     label="Classification Model")
                seg_dd = gr.Dropdown(choices=SEG_CHOICES, value="ResNetUnet",
                                     label="Segmentation Model")
                opacity = gr.Slider(0.0, 1.0, step=0.05, value=0.5,
                                    label="Overlay Opacity (for COVID mask)",
                                    interactive=True)
            with gr.Column():
                input_image = gr.Image(label="Upload Chest X-ray", height=400,
                                       elem_classes="upload-image", type="pil")
                with gr.Row():
                    submit = gr.Button("Analyze Image", variant="primary",
                                       elem_classes="primary-button", scale=2)
                    clear = gr.Button("Clear", variant="secondary", scale=1)
            with gr.Column():
                with gr.Group(elem_classes="results-container"):
                    output_image = gr.Image(label="Infection Areas (COVID)",
                                            visible=False, height=400)
                with gr.Row(equal_height=True):
                    diagnosis = gr.Label(label="Diagnosis Conclusion",
                                         elem_classes="results-container")
                    confidence = gr.Label(label="Confidence Score",
                                          elem_classes="results-container")
                with gr.Row():
                    details = gr.Textbox(label="Diagnosis Details",
                                         visible=False, container=False, lines=5)
        with gr.Accordion("Information", open=False):
            gr.Markdown(
                "### Tutorial\n"
                "1. Upload or drag-and-drop a chest X-ray image.\n"
                "2. Select your trained Classification and Segmentation models.\n"
                "3. Choose 'Analyze Image'.\n"
                "4. For COVID cases, the segmentation mask is overlaid in red.")

        handle, clear_all = make_handlers(processor, gr)

        submit.click(handle, [input_image, cls_dd, seg_dd, opacity],
                     [diagnosis, confidence, output_image, details])
        clear.click(clear_all, [], [diagnosis, confidence, output_image, details])
    return ui


def launch_demo(share: bool = False, cfg: EvalConfig = EvalConfig()):
    create_interface(cfg).launch(share=share)
