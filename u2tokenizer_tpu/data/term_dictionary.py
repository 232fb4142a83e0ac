"""Anatomy term -> description dictionary for prompt synthesis.

Compact counterpart of src/dataset/term_dictionary.py (a 4.5k-line vendored
organ/description bank used by the QA-generation pipeline, duplicated under
eval/M3D-Bench/dataset/). Descriptions here are standard radiology anatomy
definitions; the synthesis clients fall back to the bare term when an entry
is missing, so coverage can grow incrementally.
"""

term_dictionary = {
    "liver": "the largest solid abdominal organ, in the right upper quadrant;"
             " assessed for size, contour, parenchymal density, and focal"
             " lesions",
    "spleen": "a lymphatic organ in the left upper quadrant; assessed for"
              " splenomegaly and focal lesions",
    "pancreas": "a retroperitoneal gland crossing the upper abdomen; assessed"
                " for ductal dilation, masses, and peripancreatic fat"
                " stranding",
    "gallbladder": "a bile-storing sac beneath the liver; assessed for wall"
                   " thickening, distension, and calculi",
    "kidney": "paired retroperitoneal organs; assessed for size, cysts,"
              " masses, calculi, and hydronephrosis",
    "left kidney": "the left of the paired retroperitoneal urinary organs",
    "right kidney": "the right of the paired retroperitoneal urinary organs",
    "adrenal gland": "small endocrine glands above each kidney; assessed for"
                     " nodules and hyperplasia",
    "stomach": "the gastric chamber between esophagus and duodenum; assessed"
               " for wall thickening and distension",
    "duodenum": "the first segment of the small bowel",
    "esophagus": "the muscular tube from pharynx to stomach; assessed for"
                 " wall thickening and dilation",
    "aorta": "the main systemic artery; assessed for aneurysm, dissection,"
             " and calcification",
    "inferior vena cava": "the main systemic vein returning blood to the"
                          " right atrium",
    "portal vein": "the vein draining the gut into the liver; assessed for"
                   " thrombosis and dilation",
    "bladder": "the urinary reservoir in the pelvis; assessed for wall"
               " thickening and intraluminal lesions",
    "prostate": "a male pelvic gland below the bladder; assessed for"
                " enlargement and calcification",
    "uterus": "a female pelvic organ; assessed for size, masses, and"
              " endometrial thickening",
    "lung": "paired aerated thoracic organs; assessed for nodules,"
            " consolidation, ground-glass opacity, and emphysema",
    "left lung": "the two-lobed left thoracic lung",
    "right lung": "the three-lobed right thoracic lung",
    "trachea": "the central airway; assessed for narrowing, deviation, and"
               " intraluminal lesions",
    "heart": "the mediastinal cardiac chambers; assessed for cardiomegaly,"
             " pericardial effusion, and coronary calcification",
    "mediastinum": "the central thoracic compartment; assessed for masses and"
                   " lymphadenopathy",
    "pleura": "the membranes lining the lungs; assessed for effusion,"
              " thickening, and pneumothorax",
    "thyroid": "a butterfly-shaped neck gland; assessed for nodules and"
               " enlargement",
    "spinal cord": "the central nervous structure within the spinal canal",
    "vertebrae": "the bones of the spinal column; assessed for fractures,"
                 " lesions, and degenerative change",
    "rib": "the paired thoracic cage bones; assessed for fractures and"
           " lesions",
    "bone": "the skeletal structures; assessed for lytic or sclerotic"
            " lesions and fractures",
    "lymph node": "small immune structures; enlargement beyond ~1 cm short"
                  " axis is reported as lymphadenopathy",
    "colon": "the large bowel; assessed for wall thickening, masses, and"
             " diverticula",
    "intestine": "the small and large bowel loops; assessed for obstruction"
                 " and wall abnormality",
    "brain": "the intracranial neural tissue; assessed for hemorrhage,"
             " infarction, and mass effect",
    "brainstem": "the midbrain, pons, and medulla connecting brain and cord",
}


def describe_term(term: str) -> str:
    """Term description for prompt synthesis; falls back to the bare term."""
    return term_dictionary.get(term.lower().strip(), term)
