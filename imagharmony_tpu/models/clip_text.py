# placeholder, filled in next milestone
